package graft
import org.apache.spark.sql.SparkSession
object ExplainProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q156_host_boilerplate", "q158_code_switch", "q154_url_templates", "q155_revisit_schedule", "q162_kwic")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(plan).length
      val bc = "BroadcastHashJoin".r.findAllIn(plan).length
      println(s"== $q: exchanges=$nEx broadcastJoins=$bc gen=${"Generate".r.findAllIn(plan).length}")
    }
    spark.stop()
  }
}
