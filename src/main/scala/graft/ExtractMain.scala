package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{CompactStage, DedupStage, ExtractJob, LocalManifestCommitter, SpanCleanStage}
import graft.sources.PagesSynth

/** spark-submit entry point for the extraction job (north_rule: "launched via
  * spark-submit on multi-executor clusters").
  *
  *   spark-submit --class graft.ExtractMain <jar> \
  *     --out /path/out [--input /path/pages_parquet | --warc /path/warcs | --synth N] \
  *     [--num-parts 32] [--batch-size 8] [--lang en] [--max-batches K] \
  *     [--dedup 0.8] [--compact 128] [--span-clean 10]
  *
  * `--span-clean N` rebuilds every document keeping only the corpus-wide
  * first occurrence of each N-token span
  * ([[graft.pipeline.SpanCleanStage]] — the C4 boilerplate-strip step).
  *
  * `--compact M` compacts each committed url-hash partition of the
  * extracted table to ~M-MiB files ([[graft.pipeline.CompactStage]] — the
  * Iceberg rewrite_data_files analog; row-preserving, per-partition
  * atomic, no-op on already-compact partitions).
  *
  * `--dedup T` runs the composed curation pipeline: after extraction
  * commits, [[graft.pipeline.DedupStage]] closes exact + verified-MinHash
  * duplicate clusters (Jaccard ≥ T) over the extracted text and writes the
  * cluster table, the keepers-only corpus, and per-partition dedup
  * accounting under `<out>/dedup/`.
  *
  * With `--input`, reads a parquet pages table with the BASELINE.json:15
  * schema (in production: an Iceberg table — the committer seam is
  * [[graft.pipeline.PartitionCommitter]]). With `--synth N`, generates the
  * deterministic synthetic table. Resume is automatic: committed part_ids in
  * `<out>/_manifest` are skipped.
  */
object ExtractMain {

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val out = opts.getOrElse("--out", sys.error("--out required"))
    val numParts = opts.getOrElse("--num-parts", "32").toInt
    val batchSize = opts.getOrElse("--batch-size", "8").toInt
    val maxBatches = opts.getOrElse("--max-batches", Int.MaxValue.toString).toInt
    // two sources at once is ambiguous — without this, --warc would be
    // silently ignored and the job would "succeed" against the wrong input
    require(!(opts.contains("--input") && opts.contains("--warc")),
      "--input and --warc are mutually exclusive; pass exactly one source")

    val builder = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // master comes from spark-submit; default for bare `java -cp` runs:
    val spark = (if (opts.contains("--master") || sys.props.contains("spark.master"))
      builder else builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pages = (opts.get("--input"), opts.get("--warc")) match {
      case (Some(path), _) => spark.read.parquet(path)
      case (None, Some(dir)) =>
        // WARC rows carry no lang metadata: a --lang filter would match
        // nothing (null === l is never true) and silently commit empty
        // partitions — refuse rather than "succeed" with zero docs
        require(!opts.contains("--lang"),
          "--lang requires an input with language metadata (--input); WARC rows have lang = null")
        graft.sources.WarcReader.pages(spark, dir)
      case _ => PagesSynth.pagesDF(spark, opts.getOrElse("--synth", "1000").toLong)
    }
    val cfg = ExtractJob.Config(
      numParts = numParts, batchSize = batchSize,
      langFilter = opts.get("--lang"),
      inputSnapshot = opts.get("--input")
        .orElse(opts.get("--warc").map(d => s"warc:$d"))
        .getOrElse(s"synth-${opts.getOrElse("--synth", "1000")}"),
      maxBatches = maxBatches)

    val t0 = System.nanoTime()
    val res = ExtractJob.run(spark, pages, out, cfg)
    val wallS = (System.nanoTime() - t0) / 1e9

    val mf = new LocalManifestCommitter(out).rows()
    val docs = mf.map(_.docs).sum
    val bytes = mf.map(_.bytes).sum
    val compactJson = opts.get("--compact").map { mb =>
      val c = CompactStage.run(spark, out, mb.toLong * 1024 * 1024)
      s""","compact":{"target_mb":$mb,"parts":${c.parts},"parts_rewritten":${c.partsRewritten},""" +
        s""""files_before":${c.filesBefore},"files_after":${c.filesAfter}}"""
    }.getOrElse("")
    val spanJson = opts.get("--span-clean").map { n =>
      val sc = SpanCleanStage.run(spark, out, n.toInt)
      s""","span_clean":{"span_tokens":$n,"docs":${sc.docs},"spans":${sc.spans},""" +
        s""""spans_dropped":${sc.spansDropped},"docs_touched":${sc.docsTouched}}"""
    }.getOrElse("")
    val dedupJson = opts.get("--dedup").map { t =>
      val d = DedupStage.run(spark, out, t.toDouble)
      s""","dedup":{"threshold":$t,"docs":${d.docs},"clustered_docs":${d.clusteredDocs},""" +
        s""""clusters":${d.clusters},"dups_dropped":${d.dupsDropped},"kept":${d.kept}}"""
    }.getOrElse("")
    println(f"""{"batches":${res.batchesRun},"parts":${res.partsCommitted.size},""" +
      f""""docs":$docs,"html_bytes":$bytes,"wall_s":$wallS%.2f,""" +
      f""""docs_per_s":${docs / math.max(wallS, 0.001)}%.1f$compactJson$spanJson$dedupJson}""")
    spark.stop()
  }
}
