package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.ExtractPipeline

/** Child-JVM probe for the N vs 4N scaling measurement: runs the extraction
  * job at exactly `cores` parallelism in a JVM that is itself pinned to
  * `cores` CPUs (taskset + -XX:ActiveProcessorCount, set by the parent
  * [[Bench]]). Pinning matters: in a shared 32-CPU JVM the "8-core" session
  * still gets 32-CPU-sized GC worker pools and steals idle cores during
  * collections, silently inflating the small-cluster baseline and corrupting
  * the efficiency ratio. One JVM per cluster size is the honest sandbox
  * proxy for one cluster per size.
  *
  *   args: <pagesParquetPath> <cores> <reps> [mode]
  *   mode: full (default) = read→extract→aggregate;
  *         scan = read→tokenize only (node count, no extraction output);
  *         io   = read + sum(length(html)) only (decode cost floor).
  *   Prints "min_wall_s=<sec>".
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val pagesPath = args(0)
    val cores = args(1).toInt
    val repsS = args(2)
    val mode = if (args.length > 3) args(3) else "full"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      // pages rows carry multi-KB binary html: the default 4096-row reader
      // batch makes ~13MB column vectors (G1 humongous objects) — 256 rows
      // keeps batches ~1MB and measures ~30% faster on the read floor
      .config("spark.sql.parquet.columnarReaderBatchSize", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(): Double = {
      val t0 = System.nanoTime()
      mode match {
        case "io" =>
          spark.read.parquet(pagesPath)
            .select(sum(length(col("html")))).collect()
        case "scan" =>
          import spark.implicits._
          spark.read.parquet(pagesPath)
            .select(col("url"), col("html"))
            .as[(String, Array[Byte])]
            .mapPartitions(_.map { case (_, b) =>
              var n = 0L
              graft.core.HtmlScanner.scan(b)(_ => { n += 1; true })
              n
            })
            .select(sum(col("value"))).collect()
        case _ =>
          ExtractPipeline.extractDS(spark.read.parquet(pagesPath), numParts = 64)
            .select(sum(length(col("text"))), sum(col("node_count"))).collect()
      }
      (System.nanoTime() - t0) / 1e9
    }
    once() // codegen/JIT warm-up
    val best = (1 to repsS.toInt).map(_ => once()).min
    println(f"min_wall_s=$best%.3f")
    spark.stop()
  }
}
