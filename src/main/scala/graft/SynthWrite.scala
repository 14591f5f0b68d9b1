package graft

import org.apache.spark.sql.SparkSession
import graft.sources.PagesSynth

/** Writes a deterministic synthetic pages corpus to parquet — input
  * generator for ExtractMain / ScalingProbe experiments.
  *
  *   sbt "runMain graft.SynthWrite <outDir> [docs] [files] [codec]"
  */
object SynthWrite {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val docs = if (args.length > 1) args(1).toLong else 100000L
    val files = if (args.length > 2) args(2).toInt else 128
    val codec = if (args.length > 3) args(3) else "snappy"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    PagesSynth.pages(spark, docs, numSlices = files)
      .write.mode("overwrite").option("compression", codec).parquet(out)
    println(s"wrote $docs docs / $files files / $codec -> $out")
    spark.stop()
  }
}
