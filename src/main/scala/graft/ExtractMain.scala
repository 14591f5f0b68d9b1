package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{CompactStage, DedupStage, ExportStage, ExtractJob, IncrementalExtract, LocalManifestCommitter, QualityStage, SpanCleanStage}
import graft.sources.PagesSynth

/** spark-submit entry point for the extraction job (north_rule: "launched via
  * spark-submit on multi-executor clusters").
  *
  *   spark-submit --class graft.ExtractMain <jar> \
  *     --out /path/out [--input /path/pages_parquet | --warc /path/warcs | --synth N] \
  *     [--num-parts 32] [--batch-size 8] [--lang en] [--max-batches K] \
  *     [--dedup 0.8] [--compact 128] [--span-clean 10] [--quality 20] \
  *     [--clf-gate 8] [--incremental /path/prev_out] [--curate 1] \
  *     [--index 64] [--export tokensPerShard] [--pack capTokens] \
  *     [--warc-out parts] [--sample n] [--pii 1] \
  *     [--dedup-index 1] [--dedup-against /path/prev_out]
  *
  * `--curate 1` runs the full production chain in one command: extract →
  * quality → span-clean → dedup → signature-index → compact with stage
  * defaults (20 / 10 / 0.8 / 128);
  * explicit per-stage flags override their parameter. The combined
  * summary lands atomically in `<out>/_curation.json`; every curation
  * stage commits through a [[graft.pipeline.StageManifest]], so a killed
  * chain re-invoked resumes mid-stage instead of recomputing.
  *
  * `--incremental P` re-crawl ingest against a previous run's output at P
  * ([[graft.pipeline.IncrementalExtract]]): urls whose html content hash
  * is unchanged reuse the previous extraction (no scanner run), changed +
  * new urls are extracted, vanished urls are tombstoned in `<out>/delta`.
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
    val (res, deltaJson) = opts.get("--incremental") match {
      case Some(prevOut) =>
        val inc = IncrementalExtract.run(spark, pages, out, prevOut, cfg)
        (inc.job,
          s""","delta":{"unchanged":${inc.delta.unchanged},"changed":${inc.delta.changed},""" +
            s""""new":${inc.delta.newDocs},"gone":${inc.delta.gone}}""")
      case None => (ExtractJob.run(spark, pages, out, cfg), "")
    }
    val wallS = (System.nanoTime() - t0) / 1e9

    val mf = new LocalManifestCommitter(out).rows()
    val docs = mf.map(_.docs).sum
    val bytes = mf.map(_.bytes).sum
    // --curate: the one-command production chain extract → span-clean →
    // dedup → compact with stage defaults; explicit per-stage flags
    // override their parameter. Each curation stage is independently
    // resumable (StageManifest), so a killed --curate run re-invoked
    // resumes mid-chain.
    val curate = opts.contains("--curate")
    // --quality N: document-level gate scoring (word bounds from N,
    // Gopher repetition, compression band) over the extracted table —
    // flags + accounting at <out>/quality/scores, resumable
    val qualityJson = opts.get("--quality")
      .orElse(if (curate) Some("20") else None).map { n =>
        val q = QualityStage.run(spark, out, n.toInt)
        s""","quality":{"min_words":$n,"docs":${q.docs},"kept":${q.kept},""" +
          s""""fail_len":${q.failLen},"fail_rep":${q.failRep},""" +
          s""""fail_compress":${q.failCompress}}"""
      }.getOrElse("")
    // --clf-gate N: model-based quality gate (graft.pipeline.ClfGateStage)
    // — trains the fixed-point logistic classifier on the heuristic
    // quality flags (N gradient iterations; runs/reuses the quality stage
    // for labels), scores every doc, writes <out>/clf/scores; resumable
    val clfJson = opts.get("--clf-gate").map { n =>
      val minWords = opts.get("--quality").map(_.toInt)
        .getOrElse(20)
      val c = graft.pipeline.ClfGateStage.run(spark, out, minWords, n.toInt)
      s""","clf":{"iters":$n,"docs":${c.docs},"kept":${c.kept},""" +
        s""""agree":${c.agree},"loss_first":${c.lossFirst},""" +
        s""""loss_last":${c.lossLast}}"""
    }.getOrElse("")
    val spanJson = opts.get("--span-clean")
      .orElse(if (curate) Some("10") else None).map { n =>
        val sc = SpanCleanStage.run(spark, out, n.toInt)
        s""","span_clean":{"span_tokens":$n,"docs":${sc.docs},"spans":${sc.spans},""" +
          s""""spans_dropped":${sc.spansDropped},"docs_touched":${sc.docsTouched}}"""
      }.getOrElse("")
    val dedupJson = opts.get("--dedup")
      .orElse(if (curate) Some("0.8") else None).map { t =>
        val d = DedupStage.run(spark, out, t.toDouble)
        s""","dedup":{"threshold":$t,"docs":${d.docs},"clustered_docs":${d.clusteredDocs},""" +
          s""""clusters":${d.clusters},"dups_dropped":${d.dupsDropped},"kept":${d.kept}}"""
      }.getOrElse("")
    // --dedup-index 1: persist the release's SIGNATURE INDEX (md5
    // fingerprint + minhash per doc, constant bytes/doc) under
    // <out>/dedup/signatures — the only thing a FUTURE increment's
    // --dedup-against ever reads from this corpus (never its text)
    // (--curate implies it: a curated release should be incremental-ready,
    // so the NEXT crawl's --dedup-against has its artifact waiting)
    val dedupIndexJson = if (opts.contains("--dedup-index") || curate) {
      val ix = graft.pipeline.IncrementalDedup.buildIndex(spark, out)
      s""","dedup_index":{"docs":${ix.docs},"shingled":${ix.shingled}}"""
    } else ""
    // --dedup-against P: incremental content-dedup of THIS run's
    // extracted docs against the release index at P (exact md5 + LSH-band
    // candidates verified by sketch Jaccard); per-doc decisions at
    // <out>/dedup/incremental
    val dedupAgainstJson = opts.get("--dedup-against").map { p =>
      val b = graft.pipeline.IncrementalDedup.dedupAgainst(spark, out, p)
      s""","dedup_against":{"prev":"$p","docs":${b.docs},""" +
        s""""exact_dups":${b.exactDups},"near_dups":${b.nearDups},""" +
        s""""kept":${b.kept}}"""
    }.getOrElse("")
    // --pii: the release gate — emails / phones / IPv4 in the extracted
    // text masked to typed placeholders (q151's Java∩RE2 regex family),
    // redacted view + per-doc audit counts at <out>/pii/redacted;
    // resumable single-unit stage (graft.pipeline.PiiStage)
    val piiJson = if (opts.contains("--pii")) {
      val p = graft.pipeline.PiiStage.run(spark, out)
      s""","pii":{"docs":${p.docs},"emails":${p.emails},""" +
        s""""phones":${p.phones},"ips":${p.ips},""" +
        s""""docs_touched":${p.docsTouched}}"""
    } else ""
    // --index N: build the SURT-ordered crawl index over the corpus (the
    // deduped kept view when --dedup/--curate produced one, else the raw
    // extracted table) into <out>/surt_index with N range partitions —
    // after this, "every url of one domain" is a few-file range read.
    val indexJson = opts.get("--index").map { n =>
      val src = {
        val kept = new java.io.File(DedupStage.keptPath(out))
        if (kept.isDirectory && kept.list().nonEmpty)
          spark.read.parquet(DedupStage.keptPath(out))
        else spark.read.parquet(ExtractJob.extractedPath(out))
      }
      val ranges = graft.sources.SurtIndex.build(
        spark, src.select("url", "text_sha"), "url", s"$out/surt_index", n.toInt)
      s""","index":{"parts":$n,"files":${ranges.size},""" +
        s""""rows":${ranges.map(_.rows).sum}}"""
    }.getOrElse("")
    // --export T: token-bounded JSONL.gz training shards over the final
    // corpus (deduped kept view when one exists, else the extracted
    // table) at <out>/export — resumable single-unit stage
    val exportJson = opts.get("--export").map { t =>
      val e = ExportStage.run(spark, out, t.toLong)
      s""","export":{"tokens_per_shard":$t,"docs":${e.docs},"tokens":${e.tokens},""" +
        s""""shards":${e.shards},"max_shard_tokens":${e.maxShardTokens}}"""
    }.getOrElse("")
    // --pack C: NO-SPLIT shard packing (distributed first-fit-decreasing
    // into C-token bins over the final corpus) at <out>/pack — the
    // document-integrity alternative to --export; resumable single-unit
    // stage (pipeline.PackStage / queries.CurationOps.binPack)
    val packJson = opts.get("--pack").map { c =>
      val p = graft.pipeline.PackStage.run(spark, out, c.toInt)
      s""","pack":{"cap":$c,"docs":${p.docs},"tokens":${p.tokens},""" +
        s""""bins":${p.bins},"max_fill":${p.maxFill},"all_ok":${p.allOk}}"""
    }.getOrElse("")
    // --sample N: calibrated weighted corpus draw
    // (graft.pipeline.SampleStage) — PAV-calibrates the clf-gate margins
    // into P(quality) per score bucket, then draws the n winners of the
    // integer lottery-ticket race (tickets ∝ calibrated probability);
    // runs/reuses the clf stage for scores; resumable
    val sampleJson = opts.get("--sample").map { n =>
      val minWords = opts.get("--quality").map(_.toInt).getOrElse(20)
      val iters = opts.get("--clf-gate").map(_.toInt)
        .getOrElse(graft.pipeline.ClfGateStage.GateIters)
      val sp = graft.pipeline.SampleStage.run(spark, out, n.toInt, minWords, iters)
      s""","sample":{"n":$n,"docs":${sp.docs},"sampled":${sp.sampled},""" +
        s""""buckets":${sp.buckets},"p_min_x1e6":${sp.pMinX1e6},""" +
        s""""p_max_x1e6":${sp.pMaxX1e6}}"""
    }.getOrElse("")
    // --warc-out N: re-emit the (curated) page set as N .warc.gz response
    // archives + .cdx.gz CDXJ index sidecars under <out>/warc
    // (graft.sources.WarcWriter — one gzip member per record, so the CDX
    // offsets support single-record range reads). When a dedup kept view
    // exists, only its urls are emitted (the curated crawl); else all
    // input pages (a format conversion). Repartitioned by url so archive
    // membership is deterministic and independent of the input layout.
    val warcOutJson = opts.get("--warc-out").map { n =>
      val keptDir = new java.io.File(DedupStage.keptPath(out))
      val urls =
        if (keptDir.isDirectory && keptDir.list().nonEmpty)
          Some(spark.read.parquet(DedupStage.keptPath(out)).select("url"))
        else None
      val src = urls.map(u => pages.join(u, Seq("url"), "left_semi"))
        .getOrElse(pages)
        .repartition(n.toInt, org.apache.spark.sql.functions.col("url"))
      // on an --incremental run, unchanged pages are archived as WARC
      // `revisit` records (identical-payload-digest) instead of full
      // responses — container-level dedup matching the scanner-skip
      if (opts.contains("--incremental"))
        graft.sources.WarcWriter.writeIncremental(src,
          spark.read.parquet(IncrementalExtract.deltaPath(out)), s"$out/warc")
      else
        graft.sources.WarcWriter.write(src, s"$out/warc")
      val files = new java.io.File(s"$out/warc").listFiles()
      val warcs = files.count(_.getName.endsWith(".warc.gz"))
      val cdxs = files.count(_.getName.endsWith(".cdx.gz"))
      s""","warc_out":{"parts":$n,"files":$warcs,"cdx":$cdxs,""" +
        s""""filtered":${urls.isDefined}}"""
    }.getOrElse("")
    val compactJson = opts.get("--compact")
      .orElse(if (curate) Some("128") else None).map { mb =>
        val c = CompactStage.run(spark, out, mb.toLong * 1024 * 1024)
        s""","compact":{"target_mb":$mb,"parts":${c.parts},"parts_rewritten":${c.partsRewritten},""" +
          s""""files_before":${c.filesBefore},"files_after":${c.filesAfter}}"""
      }.getOrElse("")
    val summary =
      f"""{"batches":${res.batchesRun},"parts":${res.partsCommitted.size},""" +
        f""""docs":$docs,"html_bytes":$bytes,"wall_s":$wallS%.2f,""" +
        f""""docs_per_s":${docs / math.max(wallS, 0.001)}%.1f""" +
        s"$deltaJson$qualityJson$clfJson$spanJson$dedupJson$dedupIndexJson$dedupAgainstJson$piiJson$exportJson$packJson$sampleJson$warcOutJson$compactJson$indexJson}"
    // one summary manifest for the whole run (atomic tmp+rename, same
    // contract as the partition manifest) — what a scheduler reads to
    // decide the chain completed
    val tmp = java.nio.file.Paths.get(out, "_curation.json.tmp")
    java.nio.file.Files.write(tmp,
      summary.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(out, "_curation.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(summary)
    spark.stop()
  }
}
