package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** One committed input partition — FIXTURES.md §2 `manifest` schema;
  * lineage + node-count/throughput metrics per BASELINE.json:6.
  */
final case class ManifestRow(
    part_id: Int,
    input_snapshot: String,
    docs: Long,
    nodes: Long,
    bytes: Long,
    wall_ms: Long,
    status: String,
    out_sha: String,
    code_ver: String)

/** Checkpoint/lineage seam (SURVEY.md §2.l, §7.4).
  *
  * In production this is an Iceberg table: the extracted write and the
  * manifest append share one snapshot commit, giving atomic per-partition
  * checkpointing. There is no Iceberg jar in this sandbox (verified,
  * SURVEY.md §7), so [[LocalManifestCommitter]] emulates the commit contract
  * with one JSON file per partition written via temp-file + atomic rename —
  * a crash between output write and manifest rename leaves the partition
  * uncommitted, and the re-run's dynamic partition overwrite makes
  * reprocessing idempotent.
  */
trait PartitionCommitter {
  /** Partition ids already committed (survives job restarts). */
  def done(): Set[Int]
  /** Atomically record these partitions as committed. */
  def commit(rows: Seq[ManifestRow]): Unit
  /** All committed rows (for reporting/lineage queries). */
  def rows(): Seq[ManifestRow]
}

/** Committed-ARTIFACT manifest for the curation stages — the cross-stage
  * analog of [[LocalManifestCommitter]]'s per-partition records (round-4
  * verdict item 2). Each unit of curation work (the dedup cluster table, a
  * batch of kept-view partitions, the span-cleaned table, …) commits one
  * JSON record via temp-file + atomic rename, stamped with a FINGERPRINT
  * of the inputs it was computed from (the extraction manifest's out_shas
  * + stage parameters). A re-run skips any unit whose committed
  * fingerprint matches — so a curation pass killed mid-run resumes at the
  * unit boundary instead of recomputing hours of closure work, and a
  * changed input (new extraction, different threshold) invalidates stale
  * artifacts automatically instead of silently reusing them. On Iceberg
  * the same records ride the snapshot summary (docs/ICEBERG.md).
  */
final class StageManifest(dir: java.nio.file.Path) {

  private def fileFor(unit: String) = dir.resolve(s"$unit.json")

  /** The fingerprint this unit was committed under, if any. */
  def committed(unit: String): Option[String] = {
    val f = fileFor(unit)
    if (!Files.isRegularFile(f)) return None
    val s = new String(Files.readAllBytes(f), UTF_8)
    Some(s.split("\"fingerprint\":\"")(1).split("\"")(0))
  }

  def isCommitted(unit: String, fingerprint: String): Boolean =
    committed(unit).contains(fingerprint)

  /** Numeric summary values stored with the unit's commit record. */
  def info(unit: String): Map[String, Long] = {
    val f = fileFor(unit)
    if (!Files.isRegularFile(f)) return Map.empty
    val s = new String(Files.readAllBytes(f), UTF_8)
    "\"([a-z_]+)\":(-?[0-9]+)".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  def commit(unit: String, fingerprint: String,
             info: Map[String, Long] = Map.empty): Unit = {
    Files.createDirectories(dir)
    val extras = info.toSeq.sortBy(_._1)
      .map { case (k, v) => s""","$k":$v""" }.mkString
    val json = s"""{"unit":"$unit","fingerprint":"$fingerprint"$extras}"""
    val tmp = dir.resolve(s"$unit.json.tmp")
    Files.write(tmp, json.getBytes(UTF_8))
    Files.move(tmp, fileFor(unit),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}

object StageManifest {
  /** Fingerprint of a curation stage's inputs: the extraction manifest's
    * per-partition digests (any recommitted partition changes it) plus the
    * stage's parameters. sha-256 over a canonical string.
    */
  def fingerprint(outDir: String, params: String): String = {
    val rows = new LocalManifestCommitter(outDir).rows()
    val canon = rows.sortBy(_.part_id)
      .map(r => s"${r.part_id}:${r.out_sha}:${r.docs}").mkString("|") +
      "#" + params
    ExtractPipeline.sha256Hex(canon)
  }
}

final class LocalManifestCommitter(outDir: String) extends PartitionCommitter {
  private val dir: Path = Paths.get(outDir, "_manifest")

  override def done(): Set[Int] = {
    if (!Files.isDirectory(dir)) return Set.empty
    Files.list(dir).iterator.asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("part-") && s.endsWith(".json") =>
        s.stripPrefix("part-").stripSuffix(".json").toInt
      }.toSet
  }

  override def commit(rows: Seq[ManifestRow]): Unit = {
    Files.createDirectories(dir)
    rows.foreach { r =>
      val json =
        s"""{"part_id":${r.part_id},"input_snapshot":"${r.input_snapshot}",""" +
        s""""docs":${r.docs},"nodes":${r.nodes},"bytes":${r.bytes},""" +
        s""""wall_ms":${r.wall_ms},"status":"${r.status}",""" +
        s""""out_sha":"${r.out_sha}","code_ver":"${r.code_ver}"}"""
      val tmp = dir.resolve(f"part-${r.part_id}%05d.json.tmp")
      Files.write(tmp, json.getBytes(UTF_8))
      Files.move(tmp, dir.resolve(f"part-${r.part_id}%05d.json"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  override def rows(): Seq[ManifestRow] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    Files.list(dir).iterator.asScala
      .filter(p => p.getFileName.toString.endsWith(".json"))
      .map { p =>
        val s = new String(Files.readAllBytes(p), UTF_8)
        def str(k: String) = s.split("\"" + k + "\":\"")(1).split("\"")(0)
        def num(k: String) = s.split("\"" + k + "\":")(1).split("[,}]")(0).toLong
        ManifestRow(num("part_id").toInt, str("input_snapshot"), num("docs"),
          num("nodes"), num("bytes"), num("wall_ms"), str("status"),
          str("out_sha"), str("code_ver"))
      }.toSeq.sortBy(_.part_id)
  }
}
