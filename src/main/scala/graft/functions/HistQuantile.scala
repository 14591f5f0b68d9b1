package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed `Aggregator` UDAF (SURVEY.md §2.C / §4.3): approximate
  * quantiles via a fixed-width histogram sketch — `$100`-wide bins of a
  * price-like double, quantile = lower-bound bin of the smallest bin whose
  * cumulative count reaches the target rank (integer rank arithmetic:
  * `100*cum >= pct*total`, so Spark and a SQL oracle agree exactly with no
  * float-rounding hazard).
  *
  * Scale properties (why a sketch, not `percentile_approx`-style sorting):
  * state is one (bin → count) map whose size is bounded by the value range,
  * independent of row count; `merge` is additive, so partial aggregation
  * (map-side combine) applies and a 100 TB quantile costs one hash
  * aggregation pass — no global sort, no per-group value buffering.
  */
object HistQuantile
    extends Aggregator[Double, scala.collection.mutable.HashMap[Long, Long], Seq[Long]] {

  private type Buf = scala.collection.mutable.HashMap[Long, Long]

  final val BinWidth = 100.0
  final val Pcts: Seq[Long] = Seq(50L, 90L, 99L)

  def binOf(x: Double): Long = math.floor(x / BinWidth).toLong

  // mutable buffer: the aggregator holds the buffer as a live object
  // between rows (ObjectHashAggregate), so per-row immutable-map copies
  // would be pure heap churn on the hot path; zero() returns a FRESH map
  // per group and reduce/merge mutate in place
  override def zero: Buf = scala.collection.mutable.HashMap.empty

  override def reduce(m: Buf, x: Double): Buf = {
    // non-finite values have no bin: math.floor(NaN).toLong == 0 would
    // silently count NaN in bin 0 and skew every quantile (and diverge from
    // a SQL oracle's floor/CAST); skip them like SQL aggregates skip NULL
    if (java.lang.Double.isFinite(x)) {
      val b = binOf(x)
      m.update(b, m.getOrElse(b, 0L) + 1L)
    }
    m
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foreach { case (k, v) => big.update(k, big.getOrElse(k, 0L) + v) }
    big
  }

  /** Lower-bound bin per requested percentile (Pcts order); empty input →
    * all -1 (never happens under a groupBy with ≥1 row per group).
    */
  override def finish(m: Buf): Seq[Long] = {
    if (m.isEmpty) return Pcts.map(_ => -1L)
    val total = m.valuesIterator.sum
    val sorted = m.toSeq.sortBy(_._1)
    Pcts.map { pct =>
      var cum = 0L
      var ans = sorted.last._1
      val it = sorted.iterator
      var found = false
      while (it.hasNext && !found) {
        val (bin, cnt) = it.next()
        cum += cnt
        if (100L * cum >= pct * total) { ans = bin; found = true }
      }
      ans
    }
  }

  // kryo: in-memory the buffer stays a live object; serialization only
  // happens at the partial/final exchange boundary
  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()

  /** Untyped-DataFrame form: `df.agg(HistQuantile.udafColumn(col("x")))`. */
  def udafColumn(c: Column): Column = udaf(this, Encoders.scalaDouble)(c)
}
