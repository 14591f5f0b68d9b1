package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Clean-room HyperLogLog distinct-count sketch (Flajolet et al., AofA
  * 2007, with the standard linear-counting small-range correction) — the
  * MERGEABLE cardinality summary a 100 TB corpus keeps per partition /
  * per source / per day: unlike `COUNT(DISTINCT x)` (whose exact form
  * must shuffle every distinct key to one aggregation), the sketch is a
  * constant 2^p bytes, register-wise-max mergeable — so partial
  * aggregation applies, per-shard sketches roll up to corpus totals
  * without re-reading data, and yesterday's sketch unions with today's
  * for free. Spark's own `approx_count_distinct` is the same family
  * (HLL++); this implementation exposes what that one hides: the sketch
  * BYTES as a first-class column that can be stored in a manifest,
  * merged across snapshots, and estimated later ([[HllOps.estimate]],
  * [[HllMerge]]).
  *
  * Input is a 64-bit hash column (`xxhash64(key)` — hashing stays inside
  * whole-stage codegen; the aggregator only buckets). Register j = top p
  * hash bits; register value = rank (count of leading zeros + 1) of the
  * remaining 64-p bits. Relative error ≈ 1.04/√(2^p): p=12 (4 KiB) →
  * ~1.6 %.
  */
object HllOps {

  /** Raw-estimate bias constant α_m for m ≥ 128. */
  private def alpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m)

  /** Cardinality estimate from sketch register bytes (one byte per
    * register; length = 2^p). Includes the linear-counting small-range
    * correction; the 64-bit hash space needs no large-range correction.
    * Malformed input → 0.
    */
  def estimate(regs: Array[Byte]): Long = {
    if (regs == null || regs.length < 128 ||
      (regs.length & (regs.length - 1)) != 0) return 0L
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xff
      sum += java.lang.Math.scalb(1.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = alpha(m) * m.toDouble * m.toDouble / sum
    val e =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.rint(e).toLong
  }

  /** Register-wise max of two sketches — the union. Null/size-mismatch
    * returns the other operand (permissive identity, so folds over
    * heterogeneous history never throw).
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a == null) return b
    if (b == null || b.length != a.length) return a
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) {
      out(i) = if ((a(i) & 0xff) >= (b(i) & 0xff)) a(i) else b(i)
      i += 1
    }
    out
  }
}

/** Typed Aggregator building the register array from a LongType hash
  * column. Constant-size state, max-merge → map-side partial aggregation
  * does almost all the work; the shuffle moves 2^p bytes per group, not
  * the keys.
  */
class HllBuild(p: Int) extends Aggregator[Long, Array[Byte], Array[Byte]] {
  require(p >= 7 && p <= 16, s"p=$p out of [7,16]")
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(buf: Array[Byte], hash: Long): Array[Byte] = {
    val j = (hash >>> (64 - p)).toInt
    val w = hash << p
    // rank of the remaining 64-p bits: leading zeros + 1, capped when the
    // suffix is all zeros
    val rank = if (w == 0L) (64 - p + 1)
    else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rank > (buf(j) & 0xff)) buf(j) = rank.toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Byte]): Array[Byte] = buf

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object HllBuild {
  /** `df.groupBy(...).agg(HllBuild.udafColumn(xxhash64(col("key")), 12))` */
  def udafColumn(c: Column, p: Int): Column =
    udaf(new HllBuild(p), Encoders.scalaLong)(c)
}

/** Aggregator UNIONING pre-built sketches — the rollup path: per-shard /
  * per-day sketches stored in a manifest combine to coarser granularities
  * without touching the data they summarize.
  */
class HllUnion extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = null
  override def reduce(buf: Array[Byte], s: Array[Byte]): Array[Byte] =
    HllOps.merge(buf, s)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllOps.merge(a, b)
  override def finish(buf: Array[Byte]): Array[Byte] =
    if (buf == null) Array.emptyByteArray else buf
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object HllUnion {
  def udafColumn(c: Column): Column = udaf(new HllUnion, Encoders.BINARY)(c)
}

/** `hll_estimate(sketch binary) → bigint` — codegen'd estimate readout,
  * so stored sketches are queryable from plain SQL.
  */
case class HllEstimate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hll_estimate"

  override protected def nullSafeEval(input: Any): Any =
    HllOps.estimate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllOps.estimate($c)")

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}
