package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.sources.PagesSynth
import graft.core.Extractor
import java.nio.charset.StandardCharsets.UTF_8

/** End-to-end pipeline tests (SURVEY.md §5.2.3, FIXTURES.md E-06 + resume):
  * distributed output must equal single-threaded driver-side extraction at
  * every parallelism, and a killed job must resume recomputing only
  * uncommitted partitions with byte-identical final output.
  */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("pipeline-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val N = 400L

  /** driver-side sequential oracle: (url, text, sha) for every synthesized page */
  private lazy val oracle: Map[String, (String, String)] =
    (0L until N).map { id =>
      val p = PagesSynth.pageFor(id)
      val r = Extractor.extractBytes(p.html)
      p.url -> (r.text, ExtractPipeline.sha256Hex(r.text))
    }.toMap

  test("synthesized table is deterministic and matches the declared schema") {
    val df = PagesSynth.pagesDF(spark, 50L)
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) === Seq(
      "url" -> "string", "warc_ts" -> "timestamp", "html" -> "binary",
      "text" -> "string", "lang" -> "string"))
    val a = df.select("url", "html").collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1).toSeq))
    val b = PagesSynth.pages(spark, 50L, numSlices = 7).toDF()
      .select("url", "html").collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1).toSeq))
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq)
  }

  test("E-06 parallelism invariance: extraction equals driver-side oracle at 1 and 16 slices") {
    val pages = PagesSynth.pagesDF(spark, N)
    Seq(1, 16).foreach { slices =>
      val got = ExtractPipeline.extractDS(pages, numParts = 8, repartitionSlices = slices)
        .collect().map(e => e.url -> (e.text, e.text_sha)).toMap
      assert(got.size === N)
      assert(got === oracle, s"mismatch at $slices slices")
    }
  }

  test("extracted text bytes are reconstructible from spans + entity decode (spot check)") {
    val p = PagesSynth.pageFor(42L)
    val r = Extractor.extractBytes(p.html)
    assert(r.spans.nonEmpty)
    r.spans.foreach(s => assert(s.start >= 0 && s.end <= p.html.length && s.start < s.end))
  }

  test("resume: killed job recomputes only uncommitted partitions, output byte-identical") {
    val pages = PagesSynth.pagesDF(spark, N)
    val full = Files.createTempDirectory("graft-full").toString
    val resumed = Files.createTempDirectory("graft-resume").toString
    val cfg = ExtractJob.Config(numParts = 8, batchSize = 3, repartitionSlices = 8,
      inputSnapshot = "synth-400")

    // uninterrupted run
    val r1 = ExtractJob.run(spark, pages, full, cfg)
    assert(r1.batchesRun === 3 && r1.partsCommitted.sorted === (0 until 8))

    // killed after one batch…
    val k1 = ExtractJob.run(spark, pages, resumed, cfg.copy(maxBatches = 1))
    assert(k1.batchesRun === 1 && k1.partsCommitted.size === 3)
    // …then resumed: must process exactly the remaining 5 partitions
    val k2 = ExtractJob.run(spark, pages, resumed, cfg)
    assert(k2.partsCommitted.sorted === (0 until 8).filterNot(k1.partsCommitted.contains))
    // …and a third run is a no-op
    val k3 = ExtractJob.run(spark, pages, resumed, cfg)
    assert(k3.batchesRun === 0 && k3.partsCommitted.isEmpty)

    def slurp(dir: String) = spark.read.parquet(ExtractJob.extractedPath(dir))
      .select("url", "text_sha", "node_count", "part_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    assert(slurp(resumed) === slurp(full))

    // manifest: exact docs/nodes, lineage fields populated
    val mf = new LocalManifestCommitter(full).rows()
    assert(mf.map(_.part_id) === (0 until 8))
    assert(mf.map(_.docs).sum === N)
    assert(mf.forall(m => m.nodes > 0 && m.status == "done" &&
      m.input_snapshot == "synth-400" && m.out_sha.nonEmpty))
    // bytes metric ≈ total html bytes (exact here: no task retries)
    val totalHtml = (0L until N).map(id => PagesSynth.htmlFor(id).getBytes(UTF_8).length.toLong).sum
    assert(mf.map(_.bytes).sum === totalHtml)
  }

  test("incremental re-crawl: unchanged reused without scanning, changed/new extracted, gone tombstoned") {
    val v1 = PagesSynth.pagesDF(spark, N)
    val out1 = Files.createTempDirectory("graft-inc1").toString
    val out2 = Files.createTempDirectory("graft-inc2").toString
    val out3 = Files.createTempDirectory("graft-inc3").toString
    val cfg = ExtractJob.Config(numParts = 8, batchSize = 4, repartitionSlices = 8,
      inputSnapshot = "crawl-v1")
    ExtractJob.run(spark, v1, out1, cfg)

    // crawl v2, planted deterministically off the url hash: bucket 0 of 10
    // vanishes (gone), bucket 1 gets appended content (changed), the rest
    // are byte-identical (unchanged); 40 brand-new urls join
    val bucket = pmod(xxhash64(col("url")), lit(10L))
    val carried = v1.filter(bucket =!= 0)
      .withColumn("html",
        when(bucket === 1,
          concat(col("html"), lit("<p>recrawl updated this page body</p>".getBytes(UTF_8))))
          .otherwise(col("html")))
    val newPages = PagesSynth.pagesDF(spark, N + 40L)
      .join(v1.select("url"), Seq("url"), "left_anti")
    val v2 = carried.unionByName(newPages)

    val expGone = v1.filter(bucket === 0).count()
    val expChanged = v1.filter(bucket === 1).count()
    val expUnchanged = N - expGone - expChanged
    val inc = IncrementalExtract.run(spark, v2, out2, out1, cfg.copy(inputSnapshot = "crawl-v2"))
    assert(inc.delta === IncrementalExtract.DeltaSummary(
      expUnchanged, expChanged, 40L, expGone))

    // the delta table is the tombstone record: every v1-gone url present
    // with status gone, and per-url statuses match the planted buckets
    val delta = spark.read.parquet(IncrementalExtract.deltaPath(out2))
    val mismatched = delta
      .join(v1.select(col("url"), bucket.as("b")), Seq("url"), "left")
      .withColumn("expected",
        when(col("b").isNull, "new")
          .when(col("b") === 0, "gone")
          .when(col("b") === 1, "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= col("expected")).count()
    assert(mismatched === 0L)

    // scanner-skip evidence: the manifest's bytes metric counts only rows
    // that entered the parse map — it must equal the html bytes of
    // changed+new pages alone, not the whole corpus (unchanged rows flow
    // through the reuse seam, bypassing the scanner entirely)
    val freshBytes = v2.join(
        delta.filter(col("status").isin("changed", "new")).select("url"),
        Seq("url"), "left_semi")
      .agg(sum(length(col("html")))).head().getLong(0)
    val mfBytes = new LocalManifestCommitter(out2).rows().map(_.bytes).sum
    assert(mfBytes === freshBytes,
      s"scanner saw $mfBytes html bytes, expected the $freshBytes of changed+new only")
    assert(freshBytes < mfBytesOf(out1) / 2, "delta should be a small fraction of the corpus")

    // correctness: the incremental output equals a from-scratch extraction
    // of crawl v2, row for row (text, sha, spans grain, content hash)
    ExtractJob.run(spark, v2, out3, cfg.copy(inputSnapshot = "crawl-v2"))
    def slurp(dir: String) = spark.read.parquet(ExtractJob.extractedPath(dir))
      .select(col("url"), col("text"), col("text_sha"), size(col("spans")),
        col("node_count"), col("html_hash"), col("part_id"))
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(slurp(out2) === slurp(out3))

    // html_hash pin: the stored per-row hash must equal Spark's own
    // xxhash64 column function over the same bytes (the comparability
    // contract the classification join depends on)
    val hashMismatch = spark.read.parquet(ExtractJob.extractedPath(out3))
      .join(v2.select(col("url"), xxhash64(col("html")).as("col_hash")), Seq("url"))
      .filter(col("html_hash") =!= col("col_hash")).count()
    assert(hashMismatch === 0L)
  }

  private def mfBytesOf(dir: String): Long =
    new LocalManifestCommitter(dir).rows().map(_.bytes).sum

  test("plan hygiene: parse input scan reads only url+html; part_id filter prunes readback") {
    val pages = PagesSynth.pagesDF(spark, 10L)
    // the typed map must sit over a 2-column projection, never text/lang
    val plan = ExtractPipeline.extractDS(pages, 8).queryExecution.optimizedPlan.toString
    assert(!plan.contains("warc_ts"), s"warc_ts leaked into parse plan:\n$plan")
    val analyzed = ExtractPipeline.extractDS(pages, 8).queryExecution
      .executedPlan.toString
    assert(analyzed.contains("MapPartitions") || analyzed.contains("mapPartitions"))
  }

  test("null html rows extract to empty text, never NPE") {
    import spark.implicits._
    val df = Seq(("u1", "<p>hello world text</p>".getBytes(UTF_8)),
      ("u2", null: Array[Byte])).toDF("url", "html")
    val out = ExtractPipeline.extractDS(df, 4).collect()
    assert(out.length === 2)
    assert(out.find(_.url == "u2").get.text === "")
    assert(out.find(_.url == "u1").get.text === "hello world text")
  }

  test("extraction policy and transcode opt-in flow through the pipeline") {
    import spark.implicits._
    import graft.core.Extractor
    val html = "<nav><p>menu words here now</p></nav><p>&copy; body text words</p>"
    val latin1 = ("<meta charset=iso-8859-1>" + html)
      .replace("body", "café").getBytes("ISO-8859-1")
    val df = Seq(("u1", html.getBytes(UTF_8)), ("u2", latin1)).toDF("url", "html")
    // default policy: nav dropped, &copy; verbatim, no transcode
    val d = ExtractPipeline.extractDS(df, 2).collect().map(r => r.url -> r.text).toMap
    assert(d("u1") === "&copy; body text words")
    assert(!d("u2").contains("café"), "no transcode by default")
    // custom policy: keep nav, extended entities, transcode Latin-1
    val cfg = Extractor.ExtractConfig(
      dropTags = Extractor.DropTags - "nav", extendedEntities = true)
    val c = ExtractPipeline
      .extractDS(df, 2, extractCfg = cfg, transcodeNonUtf8 = true)
      .collect().map(r => r.url -> r.text).toMap
    assert(c("u1") === "menu words here now\n© body text words")
    assert(c("u2").contains("café"), s"transcode failed: ${c("u2")}")
  }

  test("maxDocBytes guard quarantines oversized pages, keeps the rest") {
    val out = Files.createTempDirectory("guard").toString
    val pages = PagesSynth.pagesDF(spark, 300L) // giants at ids 0 and 211
    val res = ExtractJob.run(spark, pages, out,
      ExtractJob.Config(numParts = 4, batchSize = 4, maxDocBytes = 100000L))
    assert(res.oversizedSkipped === 2)
    assert(res.docsObserved === 298) // observe-based write audit agrees
    val got = spark.read.parquet(ExtractJob.extractedPath(out))
    assert(got.count() === 298)
    assert(got.filter(col("node_count") < 0).count() === 0)
  }

  test("SparkEntry.entry returns extracted rows with the declared output schema") {
    val df = graft.SparkEntry.entry(spark)
    assert(df.columns.toSeq === Seq("url", "text", "text_sha", "spans",
      "node_count", "html_hash", "part_id"))
    assert(df.count() === 300)
    assert(df.filter(length(col("text")) > 0).count() === 300)
  }

  test("compaction: fewer files, identical rows, idempotent (ExtractMain --compact path)") {
    val out = Files.createTempDirectory("compact").toString
    // small batches + a wide pre-parse spread → every partition accumulates
    // many small files across batches (the incremental-ingest pathology)
    ExtractJob.run(spark, PagesSynth.pagesDF(spark, 200L), out,
      ExtractJob.Config(numParts = 4, batchSize = 1, repartitionSlices = 8))
    def snapshot() = spark.read.parquet(ExtractJob.extractedPath(out))
      .select("url", "text_sha", "node_count", "part_id")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val beforeRows = snapshot()
    val c1 = CompactStage.run(spark, out, targetFileBytes = 128L * 1024 * 1024)
    assert(c1.filesBefore > c1.filesAfter,
      s"no compaction happened: ${c1.filesBefore} -> ${c1.filesAfter}")
    assert(c1.partsRewritten === 4 && c1.filesAfter === 4) // 1 file per part
    // row-preserving
    assert(snapshot() === beforeRows)
    // idempotent: a second run finds nothing to do
    val c2 = CompactStage.run(spark, out, targetFileBytes = 128L * 1024 * 1024)
    assert(c2.partsRewritten === 0 && c2.filesAfter === c1.filesAfter)
    assert(snapshot() === beforeRows)
  }

  test("surt index stage: every extracted url findable via its domain prefix, pruned (ExtractMain --index path)") {
    import org.apache.spark.sql.functions.{col, call_function}
    val out = Files.createTempDirectory("surtstage").toString
    ExtractJob.run(spark, PagesSynth.pagesDF(spark, 150L), out,
      ExtractJob.Config(numParts = 4, batchSize = 4))
    val extracted = spark.read.parquet(ExtractJob.extractedPath(out))
    val ranges = graft.sources.SurtIndex.build(
      spark, extracted.select("url", "text_sha"), "url", s"$out/surt_index", 6)
    assert(ranges.map(_.rows).sum === extracted.count())
    // pick the synthetic corpus's most common host and range-read it back
    graft.functions.GraftExtensions.ensureRegistered(spark)
    val byHost = extracted
      .select(call_function("surt_key", col("url")).as("surt"))
      .selectExpr("substring_index(surt, ')', 1) AS rhost")
      .groupBy("rhost").count().orderBy(col("count").desc).head()
    val prefix = byHost.getString(0) + ")"
    val viaIndex = graft.sources.SurtIndex
      .lookupPrefix(spark, s"$out/surt_index", prefix)
      .select("url").collect().map(_.getString(0)).sorted.toSeq
    val viaScan = extracted
      .filter(call_function("surt_key", col("url")).startsWith(prefix))
      .select("url").collect().map(_.getString(0)).sorted.toSeq
    assert(viaIndex === viaScan)
    assert(viaIndex.size === byHost.getLong(1))
    val touched = graft.sources.SurtIndex.filesForPrefix(
      graft.sources.SurtIndex.manifest(spark, s"$out/surt_index"), prefix)
    assert(touched.size < ranges.size,
      s"one host touched ${touched.size}/${ranges.size} files — no pruning")
  }

  test("quality stage: gates match an independent driver-side reference; resumable; accounting exact") {
    val out = Files.createTempDirectory("quality").toString
    ExtractJob.run(spark, PagesSynth.pagesDF(spark, 120L), out,
      ExtractJob.Config(numParts = 4, batchSize = 4))
    val q = QualityStage.run(spark, out, minWords = 20)
    assert(q.docs === 120L)
    assert(q.kept === q.docs - spark.read.parquet(QualityStage.scoresPath(out))
      .filter(!col("keep")).count())

    // independent reference: collect texts, recompute every gate in plain
    // Scala (word split, distinct fraction, the shared deflate kernel)
    val texts = spark.read.parquet(ExtractJob.extractedPath(out))
      .select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val expKeep = texts.map { case (url, text) =>
      val toks = text.toLowerCase(java.util.Locale.ROOT).trim
        .split("[ \t\n\f\r]+").filter(_.nonEmpty)
      val words = toks.length.toLong
      val dup = if (words > 0) 1000L * (words - toks.distinct.length) / words
                else 1000L
      val ratio = graft.functions.ExtractOps.deflateRatioX1000(
        org.apache.spark.unsafe.types.UTF8String.fromString(text))
      url -> (words >= 20 && words <= 100000 && dup <= 600 &&
        ratio >= 200 && ratio <= 1100)
    }
    val gotKeep = spark.read.parquet(QualityStage.scoresPath(out))
      .select("url", "keep").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(gotKeep === expKeep)
    assert(q.kept === expKeep.count(_._2).toLong)

    // resume: second run answers from the manifest without recompute
    val scoreFile = new java.io.File(QualityStage.scoresPath(out))
      .listFiles().filter(_.getName.startsWith("part_id=")).head
    val mtime = scoreFile.lastModified()
    val q2 = QualityStage.run(spark, out, minWords = 20)
    assert(q2 === q)
    assert(scoreFile.lastModified() === mtime, "resume rewrote committed scores")
    // changed parameter -> new fingerprint -> recompute
    val q3 = QualityStage.run(spark, out, minWords = 1)
    assert(q3.failLen < q.failLen || q3.kept >= q.kept)
  }

  test("clf-gate stage: learns the heuristic gate, deterministic, resumable") {
    val out = Files.createTempDirectory("clfgate").toString
    ExtractJob.run(spark, PagesSynth.pagesDF(spark, 200L), out,
      ExtractJob.Config(numParts = 4, batchSize = 4))
    val c = ClfGateStage.run(spark, out, minWords = 20)
    assert(c.docs === 200L)
    // it learns: loss falls hard and the model reproduces >= 95% of the
    // heuristic decisions it distilled (measured envelope: 99% at the
    // default 48-iteration schedule)
    assert(c.lossLast < c.lossFirst / 2 + c.lossFirst / 4,
      s"loss barely moved: ${c.lossFirst} -> ${c.lossLast}")
    assert(c.agree * 100 >= c.docs * 95, s"agreement ${c.agree}/${c.docs}")
    assert(c.kept > 0 && c.kept < c.docs, "gate degenerated to a constant")
    // scores table: one row per doc, margin sign == keep decision
    val scores = spark.read.parquet(ClfGateStage.scoresPath(out))
    assert(scores.count() === 200L)
    assert(scores.filter((col("z_x1e6") >= 0) =!= col("keep")).count() === 0L)
    // fixed-point training => bit-identical artifact on recompute: wipe
    // the manifest (not the params) and the identical summary re-emerges
    val sm = new java.io.File(ClfGateStage.manifestDir(out).toString)
    sm.listFiles().foreach(_.delete()); sm.delete()
    val c2 = ClfGateStage.run(spark, out, minWords = 20)
    assert(c2 === c, "retrained gate diverged — fixed-point broke")
    // resume: committed manifest answers without recompute
    val scoreFile = new java.io.File(ClfGateStage.scoresPath(out))
      .listFiles().filter(_.getName.startsWith("part_id=")).head
    val mtime = scoreFile.lastModified()
    val c3 = ClfGateStage.run(spark, out, minWords = 20)
    assert(c3 === c)
    assert(scoreFile.lastModified() === mtime, "resume rewrote scores")
    // kill before the unit -> partial; re-run completes
    val out2 = Files.createTempDirectory("clfgate2").toString
    ExtractJob.run(spark, PagesSynth.pagesDF(spark, 60L), out2,
      ExtractJob.Config(numParts = 2, batchSize = 2))
    assert(ClfGateStage.runResumable(spark, out2, 20, maxUnits = 0).isEmpty)
    assert(ClfGateStage.runResumable(spark, out2, 20).nonEmpty)
  }

  test("sample stage: calibration monotone, tickets honest, draw deterministic, resumable") {
    val out = Files.createTempDirectory("sample").toString
    ExtractJob.run(spark, PagesSynth.pagesDF(spark, 200L), out,
      ExtractJob.Config(numParts = 4, batchSize = 4))
    val sp = SampleStage.run(spark, out, n = 50)
    assert(sp.docs === 200L && sp.sampled === 50L)
    // calibration is a genuine map, not a constant (the gate separates)
    assert(sp.pMinX1e6 < sp.pMaxX1e6, "calibration degenerated to a constant")
    val picks = spark.read.parquet(SampleStage.picksPath(out))
      .orderBy(col("key"), col("url")).collect()
    assert(picks.length === 50)
    // calibration monotone: higher score bucket never maps to lower p
    val byBucket = picks.map(r => (r.getLong(2), r.getLong(3))).distinct.sortBy(_._1)
    byBucket.sliding(2).foreach {
      case Array((b1, p1), (b2, p2)) =>
        assert(p1 <= p2, s"calibration not monotone: bucket $b1=$p1 > $b2=$p2")
      case _ =>
    }
    // tickets honest: w == 1 + 63·p (integer), and each pick's key IS the
    // min md5 ticket over its w indices — recomputed independently here
    picks.take(10).foreach { r =>
      val (url, w, key) = (r.getString(0), r.getLong(4), r.getLong(5))
      val ref = (0L until w).map { i =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$url#$i".getBytes("UTF-8"))
        java.lang.Long.parseLong(d.take(8).map(b => f"${b & 0xff}%02x")
          .mkString.take(15), 16)
      }.min
      assert(key === ref, s"ticket mismatch for $url")
    }
    // deterministic: wipe manifest + picks, identical draw re-emerges
    val sm = new java.io.File(SampleStage.manifestDir(out).toString)
    sm.listFiles().foreach(_.delete()); sm.delete()
    val sp2 = SampleStage.run(spark, out, n = 50)
    assert(sp2 === sp)
    val picks2 = spark.read.parquet(SampleStage.picksPath(out))
      .orderBy(col("key"), col("url")).collect()
    assert(picks2.map(_.toString).toSeq === picks.map(_.toString).toSeq,
      "re-run drew a different sample")
    // resume: committed manifest answers without recompute
    val f = new java.io.File(SampleStage.picksPath(out))
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val mtime = f.lastModified()
    assert(SampleStage.run(spark, out, n = 50) === sp)
    assert(f.lastModified() === mtime, "resume rewrote the picks")
    // kill-before-unit -> partial; re-run completes
    assert(SampleStage.runResumable(spark, out, 60, maxUnits = 0).isEmpty)
    assert(SampleStage.runResumable(spark, out, 60).nonEmpty)
  }

  test("span-clean stage: cross-doc duplicate spans removed, originals keep theirs") {
    val out = Files.createTempDirectory("spanclean").toString
    val base = PagesSynth.pagesDF(spark, 30L)
    // twins under a suffixed url: same extracted text, sorts AFTER the
    // original, so every full span of a twin is a non-first occurrence
    val pages = base.unionByName(
      base.withColumn("url", concat(col("url"), lit("#b"))))
    ExtractJob.run(spark, pages, out,
      ExtractJob.Config(numParts = 4, batchSize = 4))
    val summary = SpanCleanStage.run(spark, out, spanTokens = 10)
    val cleaned = spark.read.parquet(SpanCleanStage.cleanedPath(out))
      .collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dropped"),
          r.getAs[String]("clean_text"))))
      .toMap
    assert(summary.docs === 60L && cleaned.size === 60)
    val twins = cleaned.filter(_._1.endsWith("#b"))
    assert(twins.nonEmpty)
    twins.foreach { case (url, (spans, dropped, clean)) =>
      // every FULL span of a twin is a duplicate of its original's
      assert(dropped === spans, s"$url kept a duplicated span")
      // what survives is at most the trailing partial span (< 10 tokens)
      val left = clean.split(" ").filter(_.nonEmpty).length
      assert(left < 10, s"$url clean_text still has $left tokens")
    }
    // summary sums agree with the table
    assert(summary.spansDropped ===
      cleaned.valuesIterator.map(_._2).sum)
    assert(summary.spans === cleaned.valuesIterator.map(_._1).sum)
    assert(summary.docsTouched ===
      cleaned.valuesIterator.count(_._2 > 0))
  }

  test("composed extract → dedup → accounting stage (ExtractMain --dedup path)") {
    val out = Files.createTempDirectory("dedupstage").toString
    // plant duplicates: every page appears again under a different url, so
    // the pair crosses url-hash partitions and the closure must join them
    val base = PagesSynth.pagesDF(spark, 60L)
    val pages = base.unionByName(
      base.withColumn("url", concat(col("url"), lit("#dup"))))
    ExtractJob.run(spark, pages, out,
      ExtractJob.Config(numParts = 8, batchSize = 8))
    val summary = DedupStage.run(spark, out, threshold = 0.8)
    val extracted = spark.read.parquet(ExtractJob.extractedPath(out))
    val nDocs = extracted.count()
    assert(summary.docs === nDocs && nDocs === 120L)
    // every planted (url, url#dup) pair must share a cluster
    val clusters = spark.read.parquet(DedupStage.clustersPath(out))
    val byUrl = clusters.select("url", "cluster_id", "is_keeper").collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getBoolean(2)))
      .toMap
    base.select("url").collect().map(_.getString(0)).foreach { u =>
      val (ca, _) = byUrl(u)
      val (cb, _) = byUrl(u + "#dup")
      assert(ca.isDefined && ca === cb, s"planted dup pair split for $u")
    }
    // exactly one keeper per cluster; planted dups collapse
    val keeperPerCluster = clusters.filter(col("cluster_id").isNotNull)
      .groupBy(col("cluster_id"))
      .agg(sum(when(col("is_keeper"), 1L).otherwise(0L)).as("k"))
      .collect().map(_.getLong(1))
    assert(keeperPerCluster.nonEmpty && keeperPerCluster.forall(_ == 1L))
    assert(summary.dupsDropped >= 60L)
    assert(summary.kept === nDocs - summary.dupsDropped)
    // the kept corpus view is exactly the keeper urls
    val kept = spark.read.parquet(DedupStage.keptPath(out))
    val keeperUrls = clusters.filter(col("is_keeper"))
      .select("url").collect().map(_.getString(0)).toSet
    assert(kept.select("url").collect().map(_.getString(0)).toSet === keeperUrls)
    // accounting rows (per part_id) sum to the summary
    val acct = spark.read.parquet(DedupStage.accountingPath(out))
      .agg(sum(col("docs")), sum(col("dups_dropped")), sum(col("kept"))).head()
    assert(acct.getLong(0) === nDocs)
    assert(acct.getLong(1) === summary.dupsDropped)
    assert(acct.getLong(2) === summary.kept)
  }

  test("curation kill-resume: committed units survive, resumed outputs identical, no-op re-run") {
    import scala.jdk.CollectionConverters._
    def mtimes(dir: String): Map[String, Long] = {
      val root = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.isDirectory(root)) return Map.empty
      val s = java.nio.file.Files.walk(root)
      try s.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => root.relativize(p).toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
      finally s.close()
    }
    val outA = Files.createTempDirectory("curate-killed").toString
    val outB = Files.createTempDirectory("curate-clean").toString
    val base = PagesSynth.pagesDF(spark, 60L)
    val pages = base.unionByName(
      base.withColumn("url", concat(col("url"), lit("#dup"))))
    val cfg = ExtractJob.Config(numParts = 8, batchSize = 8)
    ExtractJob.run(spark, pages, outA, cfg)
    ExtractJob.run(spark, pages, outB, cfg)

    // clean uninterrupted chain on B
    val spanB = SpanCleanStage.run(spark, outB)
    val dedupB = DedupStage.runResumable(spark, outB, 0.8, keptBatchSize = 3).get

    // A: kill the dedup stage after 2 units (clusters + first kept batch)…
    val killed = DedupStage.runResumable(spark, outA, 0.8, keptBatchSize = 3,
      maxUnits = 2)
    assert(killed.isEmpty, "maxUnits=2 must stop before the stage completes")
    val committedBefore = mtimes(DedupStage.clustersPath(outA)) ++
      mtimes(s"${DedupStage.keptPath(outA)}/part_id=0")
    assert(committedBefore.nonEmpty, "the killed run must have committed units")
    // …kill the span stage before its single unit…
    assert(SpanCleanStage.runResumable(spark, outA, maxUnits = 0).isEmpty)
    // …then resume the whole chain: both stages complete
    Thread.sleep(1100) // parquet mtime granularity can be 1 s
    val dedupA = DedupStage.runResumable(spark, outA, 0.8, keptBatchSize = 3).get
    val spanA = SpanCleanStage.runResumable(spark, outA).get
    assert(dedupA === dedupB)
    assert(spanA === spanB)
    // committed units were NOT recomputed: their files are byte-stable
    val committedAfter = mtimes(DedupStage.clustersPath(outA)) ++
      mtimes(s"${DedupStage.keptPath(outA)}/part_id=0")
    assert(committedAfter === committedBefore,
      "resume rewrote artifacts the killed run had already committed")
    // resumed outputs identical to the uninterrupted chain, row for row
    def keptRows(out: String) = spark.read.parquet(DedupStage.keptPath(out))
      .select("url", "text_sha", "part_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(keptRows(outA) === keptRows(outB))
    def cleanRows(out: String) = spark.read.parquet(SpanCleanStage.cleanedPath(out))
      .select("url", "n_spans", "n_dropped", "clean_text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(cleanRows(outA) === cleanRows(outB))
    // a third invocation is a pure manifest read: nothing rewritten at all
    val allBefore = mtimes(s"$outA/dedup")
    assert(DedupStage.runResumable(spark, outA, 0.8, keptBatchSize = 3).get === dedupA)
    assert(SpanCleanStage.runResumable(spark, outA).get === spanA)
    assert(mtimes(s"$outA/dedup") === allBefore, "no-op re-run touched artifacts")
    // a changed stage parameter invalidates the fingerprint: stale
    // artifacts are wiped and the cluster table recomputed
    val clustersStamp = mtimes(DedupStage.clustersPath(outA))
    val dedupA2 = DedupStage.runResumable(spark, outA, 0.5, keptBatchSize = 3).get
    assert(dedupA2.docs === dedupA.docs)
    assert(mtimes(DedupStage.clustersPath(outA)) !== clustersStamp,
      "a changed threshold must recompute the cluster table")
  }

  test("shardAssign equals a sequential reference and is parallelism-invariant") {
    import spark.implicits._
    // doc 13 alone exceeds the 100-token budget — must keep one shard id,
    // never split, and push the following doc past its span
    val docs = (0L until 97L).map { i =>
      val t = if (i == 13L) Seq.fill(500)("w").mkString(" ")
              else Seq.fill(10 + (i % 7).toInt)("w").mkString(" ")
      (i, t)
    }
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(UTF_8)).map("%02x".format(_)).mkString
    // independent sequential model of the same (bucket, hash, id) order
    val withH = docs.map { case (id, t) =>
      val h = java.lang.Long.parseLong(md5hex(id.toString).take(12), 16)
      (id, t.split(" ").length.toLong, h, h % 8)
    }
    var cum = 0L
    val exp = withH.sortBy { case (id, _, h, b) => (b, h, id) }.map {
      case (id, tl, h, b) =>
        val r = (id, (tl, h, b, cum, cum / 100L)); cum += tl; r
    }.toMap
    def run(parts: Int) = ExportStage.shardAssign(
        docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text",
        tokensPerShard = 100L, buckets = 8)
      .select("doc_id", "tok_len", "h", "b", "cum_before", "shard").collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val got = run(1)
    assert(got === exp)
    assert(run(13) === exp, "shard assignment depends on input partitioning")
    // the overflow doc is never split: the next doc in global order jumps
    // past every boundary the 500-token giant consumed (≥ 4 shards ahead)
    val ordered = withH.sortBy { case (id, _, h, b) => (b, h, id) }.map(_._1)
    val next = ordered(ordered.indexOf(13L) + 1)
    assert(got(next)._5 >= got(13L)._5 + 4,
      s"doc after the giant landed in shard ${got(next)._5} vs giant's ${got(13L)._5}")
  }

  test("export stage: one gz file per shard, round-trip exact, token bound, resumable (ExtractMain --export path)") {
    val out = Files.createTempDirectory("graft-export").toString
    ExtractJob.run(spark, PagesSynth.pagesDF(spark, 150L), out,
      ExtractJob.Config(numParts = 8, batchSize = 8, inputSnapshot = "export-test"))
    val tps = 3000L
    val s1 = ExportStage.run(spark, out, tps)
    val dirs = new java.io.File(ExportStage.exportPath(out)).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(dirs.length.toLong === s1.shards)
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".gz"))
      assert(files.length === 1, s"${d.getName}: ${files.length} data files")
    }
    // round trip: the jsonl shards ARE the corpus
    val back = spark.read.json(ExportStage.exportPath(out))
    val src = spark.read.parquet(ExtractJob.extractedPath(out))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("url", "text_sha", "text").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(back.count() === src.count())
    assert(key(back) === key(src))
    assert(s1.docs === src.count() && s1.tokens > 0)
    // token bound: a shard exceeds the budget only via its last doc
    // (equivalently: every doc STARTS before its shard's boundary)
    val viol = back.select(col("shard").cast("long"), col("tok_len").cast("long"))
      .groupBy("shard").agg(sum("tok_len").as("t"), count(lit(1)).as("n"))
      .where(col("t") > tps && col("n") === 1).count() // lone giants allowed
    val startsBeyond = graft.pipeline.ExportStage.shardAssign(
        src.select(col("url"), col("text"), col("text_sha")), "url", "text", tps)
      .where(col("cum_before") - col("shard") * tps >= tps).count()
    assert(startsBeyond === 0L, "a document started at/after its shard boundary")
    assert(viol >= 0L) // lone over-budget shards are legal by construction
    // shard manifest table == a recount of the shards themselves
    val mfRows = spark.read.parquet(ExportStage.shardManifestPath(out))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val recount = back
      .select(col("shard").cast("long"), col("tok_len").cast("long"))
      .groupBy("shard").agg(count(lit(1)).as("d"), sum("tok_len").as("t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(mfRows === recount, "shard manifest disagrees with the shards")
    // resumable: a re-run answers from the manifest, artifacts untouched
    def mtimes(): Seq[Long] =
      dirs.flatMap(_.listFiles().map(_.lastModified())).sorted.toSeq
    val stamp = mtimes()
    assert(ExportStage.run(spark, out, tps) === s1)
    assert(mtimes() === stamp, "no-op export re-run rewrote shards")
    // kill before the unit commits → partial, nothing claimed
    assert(ExportStage.runResumable(spark, out, 1234L, maxUnits = 0).isEmpty)
    // changed budget → new fingerprint → recompute with more shards
    val s3 = ExportStage.run(spark, out, 1000L)
    assert(s3.shards > s1.shards && s3.tokens === s1.tokens)
  }

  test("pack stage: no-split bins valid, certificates true, resumable, re-runs byte-identical") {
    import graft.pipeline.PackStage
    val out = Files.createTempDirectory("graft-pack").toString
    ExtractJob.run(spark, PagesSynth.pagesDF(spark, 120L), out,
      ExtractJob.Config(numParts = 4, batchSize = 4))
    val cap = 400
    val p1 = PackStage.run(spark, out, cap)
    assert(p1.docs === 120L && p1.allOk, s"pack summary: $p1")
    val assign = spark.read.parquet(PackStage.assignPath(out))
    assert(assign.count() === 120L)
    assert(assign.filter(!col("pack_ok")).count() === 0L)
    // bins table agrees with the assignment, caps respected (or singleton)
    val bins = spark.read.parquet(PackStage.binsPath(out)).collect()
    assert(bins.map(_.getLong(2)).sum === 120L)
    bins.foreach { b =>
      assert(b.getLong(3) <= cap || b.getLong(2) === 1L,
        s"bin over cap with ${b.getLong(2)} docs: ${b.getLong(3)}")
    }
    assert(p1.maxFill === bins.map(_.getLong(3)).max)
    // committed stage answers from the manifest without rewriting
    def mtimes(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(PackStage.assignPath(out)))
        .map(f => f.getPath -> f.lastModified).toMap
    }
    val stamp = mtimes()
    val p2 = PackStage.run(spark, out, cap)
    assert(p2 === p1)
    assert(mtimes() === stamp, "no-op pack re-run rewrote the assignment")
    // fresh out dir over the same corpus: a kill before the unit commits
    // claims nothing; the re-run then produces a byte-identical assignment
    val out2 = Files.createTempDirectory("graft-pack2").toString
    ExtractJob.run(spark, PagesSynth.pagesDF(spark, 120L), out2,
      ExtractJob.Config(numParts = 4, batchSize = 4))
    assert(PackStage.runResumable(spark, out2, cap, maxUnits = 0).isEmpty)
    PackStage.run(spark, out2, cap)
    val a1 = assign.orderBy("url").collect().map(_.toSeq).toSeq
    val a2 = spark.read.parquet(PackStage.assignPath(out2))
      .orderBy("url").collect().map(_.toSeq).toSeq
    assert(a1 === a2, "packing not deterministic across runs")
    // a different cap is a different fingerprint → recompute, more bins
    val p3 = PackStage.run(spark, out, cap / 2)
    assert(p3.bins > p1.bins && p3.tokens === p1.tokens && p3.allOk)
  }

  test("pii stage: planted PII redacted, counts match a driver-side regex reference, resumable") {
    val out = Files.createTempDirectory("graft-pii").toString
    // plant all three PII kinds into every 3rd page's html so they flow
    // through extraction into the text PiiStage reads
    val pii = "<p>contact alice@mail.example.org from 10.1.2.3 call +44 207 123456</p>"
    val pages = PagesSynth.pagesDF(spark, 90L)
      .withColumn("html",
        when(pmod(xxhash64(col("url")), lit(3)) === 0,
          concat(col("html"), lit(pii.getBytes(UTF_8))))
          .otherwise(col("html")))
    ExtractJob.run(spark, pages, out,
      ExtractJob.Config(numParts = 4, batchSize = 4))
    // driver-side reference: java.util.regex over the extracted text,
    // independent of Spark's regexp_* family
    val extracted = spark.read.parquet(ExtractJob.extractedPath(out))
      .select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    def countRe(re: String, s: String): Long =
      re.r.findAllMatchIn(s).size.toLong
    val expEmails = extracted.values.map(countRe(PiiStage.EmailRe, _)).sum
    val expPhones = extracted.values.map(countRe(PiiStage.PhoneRe, _)).sum
    val expIps = extracted.values.map(countRe(PiiStage.IpRe, _)).sum
    val expTouched = extracted.values.count(t =>
      countRe(PiiStage.EmailRe, t) + countRe(PiiStage.PhoneRe, t) +
        countRe(PiiStage.IpRe, t) > 0).toLong
    assert(expEmails >= 25L && expPhones >= 25L && expIps >= 25L,
      s"plant failed to reach the extracted text: $expEmails/$expPhones/$expIps")
    val s1 = PiiStage.run(spark, out)
    assert(s1.docs === 90L)
    assert(s1.emails === expEmails && s1.phones === expPhones &&
      s1.ips === expIps && s1.docsTouched === expTouched, s"summary: $s1")
    // redacted view: touched rows carry typed placeholders and no raw
    // match survives; untouched rows are byte-identical to the source text
    val red = spark.read.parquet(PiiStage.redactedPath(out))
      .select("url", "n_emails", "n_phones", "n_ips", "red_text").collect()
    assert(red.length === 90)
    red.foreach { r =>
      val (url, txt) = (r.getString(0), r.getString(4))
      assert(countRe(PiiStage.EmailRe, txt) === 0L, s"raw email survived in $url")
      assert(countRe(PiiStage.PhoneRe, txt) === 0L, s"raw phone survived in $url")
      assert(countRe(PiiStage.IpRe, txt) === 0L, s"raw ip survived in $url")
      if (r.getLong(1) + r.getLong(2) + r.getLong(3) > 0) {
        assert(txt.contains("[EMAIL]") || txt.contains("[PHONE]") ||
          txt.contains("[IP]"), s"touched row lost its placeholder: $url")
      } else assert(txt === extracted(url), s"untouched row rewritten: $url")
    }
    // resume: committed manifest answers without rewriting the view
    val f = new java.io.File(PiiStage.redactedPath(out))
      .listFiles().filter(_.getName.startsWith("part_id=")).head
    val mtime = f.lastModified()
    assert(PiiStage.run(spark, out) === s1)
    assert(f.lastModified() === mtime, "resume rewrote the redacted view")
    // kill before the unit -> partial; re-run completes
    val out2 = Files.createTempDirectory("graft-pii2").toString
    ExtractJob.run(spark, PagesSynth.pagesDF(spark, 30L), out2,
      ExtractJob.Config(numParts = 2, batchSize = 2))
    assert(PiiStage.runResumable(spark, out2, maxUnits = 0).isEmpty)
    assert(PiiStage.runResumable(spark, out2).nonEmpty)
  }

  test("incremental cross-release dedup: batch decided against the persisted " +
       "signature index alone — release text deleted before the batch run") {
    val out1 = Files.createTempDirectory("graft-xrel1").toString
    val out2 = Files.createTempDirectory("graft-xrel2").toString
    val cfg = ExtractJob.Config(numParts = 4, batchSize = 4,
      repartitionSlices = 8, inputSnapshot = "release-v1")
    ExtractJob.run(spark, PagesSynth.pagesDF(spark, 120L), out1, cfg)
    val relShas = spark.read.parquet(ExtractJob.extractedPath(out1))
      .select("url", "text_sha").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val ix = IncrementalDedup.buildIndex(spark, out1)
    assert(ix.docs === 120L && ix.shingled === 120L)
    // idempotent: a second call answers from the stage manifest
    assert(IncrementalDedup.buildIndex(spark, out1) === ix)

    // the increment under NEW urls: 20 exact content mirrors of release
    // pages, 10 near variants (one appended paragraph), 30 novel pages
    val mirrors = (0L until 20L).map { i =>
      PagesSynth.pageFor(i).copy(url = s"http://mirror.example/copy/$i")
    }
    val nears = (20L until 30L).map { i =>
      val p = PagesSynth.pageFor(i)
      p.copy(url = s"http://mirror.example/near/$i",
        html = p.html ++ "<p>updated</p>".getBytes(UTF_8))
    }
    val novel = (1000L until 1030L).map(PagesSynth.pageFor)
    val sp = spark; import sp.implicits._
    val batchPages = spark.createDataset(mirrors ++ nears ++ novel).toDF()
    ExtractJob.run(spark, batchPages, out2,
      cfg.copy(inputSnapshot = "release-v2"))

    // the point of the artifact: the batch run must need NOTHING from the
    // release but its signature index — delete the release text first
    rmTree(ExtractJob.extractedPath(out1))
    val b = IncrementalDedup.dedupAgainst(spark, out2, out1)

    val dec = spark.read.parquet(IncrementalDedup.incrementalPath(out2))
      .select("url", "decision", "match_url").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(dec.size === 60)
    // ground truth for exact_dup, computed independently from the two
    // extractions' sha256 columns (the index keys on md5 — same classes)
    val relShaSet = relShas.map(_._2).toSet
    val expectedExact = spark.read.parquet(ExtractJob.extractedPath(out2))
      .select("url", "text_sha").collect()
      .filter(r => relShaSet(r.getString(1))).map(_.getString(0)).toSet
    assert(expectedExact.size >= 20, "all 20 planted mirrors must be exact")
    assert(dec.filter(_._2._1 == "exact_dup").keySet === expectedExact)
    // every planted mirror resolves to the release KEEPER url: min
    // xxhash64(url) among release urls sharing its content
    val keeperBySha = spark.createDataset(relShas).toDF("url", "sha")
      .groupBy(col("sha"))
      .agg(min(struct(xxhash64(col("url")), col("url"))).as("k"))
      .select(col("sha"), col("k.url").as("keeper")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    (0L until 20L).foreach { i =>
      val p = PagesSynth.pageFor(i)
      val sha = ExtractPipeline.sha256Hex(Extractor.extractBytes(p.html).text)
      assert(dec(s"http://mirror.example/copy/$i")._2 === keeperBySha(sha))
    }
    // planted near variants: never exact (the append changes the md5);
    // caught as near_dup of their SOURCE url at high recall — fixed 2×4
    // banding deterministically misses a very short page whose one-word
    // append moves too much of its sketch, so ≥8/10 rather than 10/10
    // (NeardupSpec pins the decision logic itself exactly)
    val nearGot = (20L until 30L).map { i =>
      val (d, m) = dec(s"http://mirror.example/near/$i")
      assert(d !== "exact_dup", s"near/$i decided exact")
      if (d == "near_dup")
        assert(m === PagesSynth.pageFor(i).url, s"near/$i matched $m")
      d == "near_dup"
    }
    assert(nearGot.count(identity) >= 8,
      s"only ${nearGot.count(identity)}/10 planted nears caught")
    // summary consistency + idempotent re-run from the stage manifest
    assert(b.docs === 60 && b.exactDups === expectedExact.size &&
      b.exactDups + b.nearDups + b.kept === 60 &&
      b.nearDups >= nearGot.count(identity))
    assert(IncrementalDedup.dedupAgainst(spark, out2, out1) === b)
  }

  private def rmTree(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    if (Files.exists(root))
      Files.walk(root).iterator.asScala.toSeq.reverse
        .foreach(p => Files.delete(p))
  }
}
