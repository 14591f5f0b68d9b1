package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Clean-room Bloom filter for JOIN PRUNING — the sketch-pre-filter a
  * 100 TB decontamination/anti-join pipeline puts in front of its exact
  * join: build the filter over the SMALL side's 64-bit key hashes (one
  * tiny aggregate), broadcast the byte array, and drop the big side's
  * non-matching rows BEFORE they reach the shuffle. The contract that
  * keeps results exact: NO FALSE NEGATIVES — both sides derive the k probe
  * positions from the same hash by double hashing (Kirsch/Mitzenmacher,
  * ESA 2006: gᵢ(x) = h₁ + i·h₂, h₂ forced odd), so every key inserted is
  * always found and the exact join downstream sees every true match.
  * False positives only cost shuffle bytes (bounded by the classic
  * (1-e^(-kn/m))^k rate).
  *
  * Spark ships this machinery internally (BloomFilterAggregate backs
  * runtime row-level filtering) but does not register it as a public SQL
  * function in 4.1 — hence this ~80-line public-API equivalent using the
  * repo's established Aggregator + codegen'd-Expression surface.
  *
  * Sketch layout (BinaryType): 8-byte little-endian words; word 0 = k
  * (probe count), words 1.. = the bit array (m = 64·(words−1) bits).
  */
object BloomOps {

  @inline private def readWord(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  /** Probe: true iff all k bit positions for `hash` are set. Malformed or
    * empty sketches answer TRUE (permissive — the pre-filter may only ever
    * drop rows the exact join would drop anyway).
    */
  def contains(bytes: Array[Byte], hash: Long): Boolean = {
    if (bytes == null || bytes.length < 16 || bytes.length % 8 != 0) return true
    val k = readWord(bytes, 0)
    if (k <= 0 || k > 64) return true
    val m = (bytes.length / 8 - 1).toLong * 64
    val h2 = (hash >>> 32) | 1L
    var h = hash
    var i = 0L
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h, m)
      val word = readWord(bytes, (1 + (pos >>> 6)).toInt * 8)
      if ((word & (1L << (pos & 63).toInt)) == 0L) return false
      h += h2
      i += 1
    }
    true
  }
}

/** `graft_bloom_contains(sketch, hash)` — codegen'd probe; stays inside
  * whole-stage codegen so the pre-filter adds no fence to the scan stage.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(b: Any, h: Any): Any =
    BloomOps.contains(b.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.functions.BloomOps.contains($b, $h);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomContains =
    copy(left = l, right = r)
}

/** Typed Aggregator building the sketch from a LongType hash column.
  * Constant-size state (words+1 longs), bitwise-OR merge → partial
  * aggregation applies; building over the small join side is one pass.
  */
class BloomBuild(numBits: Int, k: Int)
    extends Aggregator[Long, Array[Long], Array[Byte]] {
  require(numBits >= 64 && k >= 1 && k <= 64, s"numBits=$numBits k=$k")
  private val words = (numBits + 63) / 64

  override def zero: Array[Long] = {
    val a = new Array[Long](words + 1)
    a(0) = k
    a
  }

  override def reduce(buf: Array[Long], hash: Long): Array[Long] = {
    val m = words.toLong * 64
    val h2 = (hash >>> 32) | 1L
    var h = hash
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h, m)
      buf(1 + (pos >>> 6).toInt) |= 1L << (pos & 63).toInt
      h += h2
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 1
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a(0) = k
    a
  }

  override def finish(buf: Array[Long]): Array[Byte] = {
    val out = new Array[Byte]((words + 1) * 8)
    var w = 0
    while (w <= words) {
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

object BloomBuild {
  /** `df.agg(BloomBuild.udafColumn(xxhash64(col("key")), bits, k))` */
  def udafColumn(c: Column, numBits: Int, k: Int): Column =
    udaf(new BloomBuild(numBits, k), Encoders.scalaLong)(c)
}
