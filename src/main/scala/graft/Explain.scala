package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan (and optionally
  * runs) any registered SparkEntry query — the `.explain`-driven iteration
  * loop the build plan calls for.
  *
  *   sbt "runMain graft.Explain <queryName|all> [sfDir] [--run]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val sfDir = args.drop(1).headOption.filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.01")
    val run = args.contains("--run")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs =
      if (name == "all") SparkEntry.queries
      else SparkEntry.queries.filter(_._1 == name)
    qs.foreach { case (n, fn) =>
      println(s"\n========== $n ==========")
      val df = fn(spark, sfDir)
      df.explain("formatted")
      if (run) {
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          val cnt = fn(spark, sfDir).count()
          println(f"run$i rows=$cnt wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
      }
    }
    spark.stop()
  }
}
