package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure unit tests for the histogram-quantile Aggregator's sketch math —
  * no Spark session needed (the plan-level behavior is covered by q44's
  * DuckDB oracle).
  */
class HistQuantileSpec extends AnyFunSuite {

  private def sketch(xs: Seq[Double]) = {
    val m = xs.foldLeft(HistQuantile.zero)(HistQuantile.reduce)
    HistQuantile.finish(m)
  }

  test("quantiles are lower-bound bins at integer rank arithmetic") {
    // 100 values 0..99 → bins 0 only (width 100): all three pcts = bin 0
    assert(sketch((0 until 100).map(_.toDouble)) === Seq(0L, 0L, 0L))
    // values 50, 150, ..., 950 (10 values, bins 0..9): p50 → bin 4 (cum 5/10),
    // p90 → bin 8, p99 → bin 9
    assert(sketch((0 until 10).map(i => i * 100.0 + 50)) === Seq(4L, 8L, 9L))
  }

  test("merge is additive and order-independent") {
    val xs = (0 until 1000).map(i => (i * 37 % 997).toDouble * 3)
    val (a, b) = xs.splitAt(400)
    val whole = xs.foldLeft(HistQuantile.zero)(HistQuantile.reduce)
    val merged = HistQuantile.merge(
      a.foldLeft(HistQuantile.zero)(HistQuantile.reduce),
      b.foldLeft(HistQuantile.zero)(HistQuantile.reduce))
    assert(HistQuantile.finish(merged) === HistQuantile.finish(whole))
  }

  test("non-finite inputs are skipped, not counted in bin 0") {
    val clean = sketch(Seq(250.0, 350.0, 450.0))
    val dirty = sketch(Seq(Double.NaN, 250.0, Double.PositiveInfinity,
      350.0, Double.NegativeInfinity, 450.0, Double.NaN))
    assert(dirty === clean,
      "NaN/Inf must not shift the sketch (math.floor(NaN).toLong == 0 trap)")
    // all-non-finite behaves like empty input
    assert(sketch(Seq(Double.NaN, Double.PositiveInfinity)) === Seq(-1L, -1L, -1L))
  }

  test("negative values bin below zero (floor, not truncation)") {
    assert(HistQuantile.binOf(-0.5) === -1L)
    assert(HistQuantile.binOf(-100.0) === -1L)
    assert(HistQuantile.binOf(-100.5) === -2L)
  }
}
