package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Clean-room count-min sketch (Cormode & Muthukrishnan, J. Algorithms
  * 2005) for HEAVY-HITTER PRUNING — the frequency analog of the repo's
  * [[BloomOps]] join pruning: build the sketch over a keyed stream in one
  * tiny aggregate (constant-size state, partial aggregation applies),
  * broadcast the byte array, and drop rows whose key's estimated count is
  * below the threshold BEFORE they reach the exact groupBy shuffle.
  *
  * The contract that keeps results exact: CMS NEVER UNDERESTIMATES —
  * every counter a key hashes to was incremented by every one of its
  * occurrences, so min-over-rows ≥ true count, and a threshold filter on
  * the estimate keeps a SUPERSET of the true heavy hitters. The exact
  * count downstream (on candidates only) removes the false positives, so
  * the final answer equals the plain exact aggregate while only candidate
  * rows ever shuffle. Overestimates are bounded by ε·N (ε = e/width) with
  * probability 1−δ (δ = e^−depth).
  *
  * Rows derive their probe positions by the same double hashing the Bloom
  * filter uses (Kirsch/Mitzenmacher, ESA 2006: gᵢ(x) = h₁ + i·h₂, h₂
  * forced odd) from one 64-bit xxhash64 input — build and probe agree by
  * construction.
  *
  * Sketch layout (BinaryType): 8-byte little-endian words; word 0 = depth
  * d, word 1 = width w, words 2.. = the d·w counters, row-major.
  */
object CmsOps {

  @inline private def readWord(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  /** Point estimate: min over the d rows' counters for `hash`. Malformed
    * or empty sketches answer Long.MaxValue (permissive — a pre-filter on
    * the estimate may only ever pass EXTRA rows to the exact aggregate,
    * never drop a true heavy hitter).
    */
  def estimate(bytes: Array[Byte], hash: Long): Long = {
    if (bytes == null || bytes.length < 24 || bytes.length % 8 != 0)
      return Long.MaxValue
    val d = readWord(bytes, 0)
    val w = readWord(bytes, 8)
    if (d <= 0 || d > 64 || w <= 0 || bytes.length != (2 + d * w) * 8)
      return Long.MaxValue
    val h2 = (hash >>> 32) | 1L
    var h = hash
    var min = Long.MaxValue
    var r = 0L
    while (r < d) {
      val pos = java.lang.Long.remainderUnsigned(h, w)
      val c = readWord(bytes, (2 + r * w + pos).toInt * 8)
      if (c < min) min = c
      h += h2
      r += 1
    }
    min
  }
}

/** `graft_cms_estimate(sketch, hash)` — codegen'd point query; stays
  * inside whole-stage codegen so the heavy-hitter pre-filter adds no
  * fence to the scan stage.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cms_estimate"

  override protected def nullSafeEval(b: Any, h: Any): Any =
    CmsOps.estimate(b.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.functions.CmsOps.estimate($b, $h);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(left = l, right = r)
}

/** Typed Aggregator building the sketch from a LongType hash column.
  * Constant-size state (2 + d·w longs), elementwise-add merge → partial
  * aggregation applies; one pass over the keyed rows, tiny result.
  */
class CmsBuild(depth: Int, width: Int)
    extends Aggregator[Long, Array[Long], Array[Byte]] {
  require(depth >= 1 && depth <= 64 && width >= 8, s"depth=$depth width=$width")

  override def zero: Array[Long] = {
    val a = new Array[Long](2 + depth * width)
    a(0) = depth
    a(1) = width
    a
  }

  override def reduce(buf: Array[Long], hash: Long): Array[Long] = {
    val h2 = (hash >>> 32) | 1L
    var h = hash
    var r = 0
    while (r < depth) {
      val pos = java.lang.Long.remainderUnsigned(h, width)
      buf(2 + r * width + pos.toInt) += 1
      h += h2
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 2
    while (i < a.length) { a(i) += b(i); i += 1 }
    a(0) = depth
    a(1) = width
    a
  }

  override def finish(buf: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](buf.length * 8)
    var w = 0
    while (w < buf.length) {
      var v = buf(w)
      var i = 0
      while (i < 8) { out(w * 8 + i) = v.toByte; v >>>= 8; i += 1 }
      w += 1
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object CmsBuild {
  /** `df.agg(CmsBuild.udafColumn(xxhash64(col("key")), depth, width))` */
  def udafColumn(c: Column, depth: Int, width: Int): Column =
    udaf(new CmsBuild(depth, width), Encoders.scalaLong)(c)
}
