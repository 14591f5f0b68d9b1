package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC) — the storage-dedup primitive (gear-hash
  * CDC in the FastCDC family, Xia et al., USENIX ATC'16 — public
  * literature): chunk boundaries are cut where a rolling gear hash of the
  * last ≤64 bytes hits a mask, so an insertion or deletion shifts only the
  * chunks it touches and the stream REALIGNS at the next content-defined
  * boundary — unlike fixed-width chunking, where one inserted byte shifts
  * every later chunk. With `min` ≥ 64 (the gear window: `h << 1` forgets a
  * byte after 64 shifts) the realignment is exact: once two streams share
  * a boundary, every later boundary is identical.
  *
  * Deterministic by construction: the 256-entry gear table is splitmix64
  * of the byte value (public-domain mixer), the chunk fingerprint is
  * 64-bit FNV-1a over the chunk bytes — both re-derivable in a sequential
  * reference, which CdcSpec pins.
  */
object CdcOps {

  /** Gear table: splitmix64(i) — Steele et al. 2014's public mixer. */
  private val Gear: Array[Long] = Array.tabulate(256) { i =>
    var z = i.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 64-bit FNV-1a over bytes [from, until). */
  def fnv1a(b: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (b(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Chunk spans of the UTF-8 bytes of `s`: (byte_off, byte_len, fnv1a).
    * Cut when len ≥ min and the gear hash masks to 0, force-cut at max;
    * the final chunk may be shorter than min. Empty input → empty array.
    */
  def chunks(s: UTF8String, min: Int, maskBits: Int, max: Int): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val mask = (1L << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear(b(i) & 0xff)
      val len = i - start + 1
      if ((len >= min && (h & mask) == 0) || len >= max) {
        out += InternalRow(start, len, fnv1a(b, start, i + 1))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n) out += InternalRow(start, n - start, fnv1a(b, start, n))
    new GenericArrayData(out.toArray)
  }
}

/** `cdc_chunks(text, min, mask_bits, max) → array<struct<off int, len int,
  * hash bigint>>` — codegen'd scalar surface over [[CdcOps.chunks]]; the
  * three parameters must be foldable int literals (they parameterize the
  * generated call site).
  */
case class CdcChunks(child: Expression, min: Int, maskBits: Int, max: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(min >= 1 && max >= min && maskBits >= 1 && maskBits <= 48,
    s"invalid cdc params min=$min maskBits=$maskBits max=$max")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("off", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcOps.chunks(input.asInstanceOf[UTF8String], min, maskBits, max)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcOps.chunks($c, $min, $maskBits, $max)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}
