package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Distributed PCA by the covariance method (public textbook shape; see
  * e.g. Halko/Martinsson/Tropp SIAM Rev. 2011 §1 for the randomized
  * alternative once d² state stops fitting): ONE distributed pass
  * accumulates the d-dim first moment and the d×d second-moment matrix
  * via a typed `Aggregator` (map-side combined, merge = vector add), the
  * driver eigendecomposes the d×d covariance with cyclic Jacobi (O(d³)
  * flops — trivial for embedding-sized d), and the projection onto the
  * top components is a stateless codegen'd kernel over the original
  * rows. At 100 TB the data pass is the only distributed cost; state is
  * 8·(1+d+d(d+1)/2) bytes per task (~17 KB at d=64), independent of row
  * count. For d ≳ 10⁴ switch to randomized range-finding (same paper);
  * the covariance method is the right tool at embedding widths.
  */
object Pca {

  /** Moment accumulator: buffer = [n, Σx_0..Σx_{d-1}, upper-tri Σx_i·x_j
    * (i ≤ j, row-major)]. Rows of the wrong width or with non-finite
    * entries are skipped (the SQL-NULL convention, same as HistQuantile).
    */
  final case class MomentAgg(d: Int)
      extends Aggregator[Seq[Double], Array[Double], Array[Double]] {
    private val len = 1 + d + d * (d + 1) / 2

    override def zero: Array[Double] = new Array[Double](len)

    override def reduce(buf: Array[Double], x: Seq[Double]): Array[Double] = {
      if (x != null && x.length == d && x.forall(java.lang.Double.isFinite)) {
        buf(0) += 1.0
        val arr = x.toArray
        var i = 0
        var k = 1 + d
        while (i < d) {
          buf(1 + i) += arr(i)
          var j = i
          while (j < d) { buf(k) += arr(i) * arr(j); j += 1; k += 1 }
          i += 1
        }
      }
      buf
    }

    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < len) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Double]): Array[Double] = buf
    override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  }

  /** Mean vector and population covariance (1/n) from a moment buffer,
    * each entry snapped to a 1e-9 grid: float-sum order noise across
    * partial-merge schedules is ~1e-12 relative, so snapping makes the
    * driver-side matrix — and everything derived from it — run-to-run
    * deterministic (the IVF centroid argument, VectorOps.scala).
    */
  def meanCov(buf: Array[Double], d: Int): (Array[Double], Array[Array[Double]]) = {
    def snap(x: Double): Double = math.rint(x * 1e9) / 1e9
    val n = buf(0)
    require(n > 0, "PCA over an empty input")
    val mu = Array.tabulate(d)(i => snap(buf(1 + i) / n))
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var k = 1 + d
    while (i < d) {
      var j = i
      while (j < d) {
        val c = snap(buf(k) / n - mu(i) * mu(j))
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1; k += 1
      }
      i += 1
    }
    (mu, cov)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (public:
    * Golub & Van Loan §8.5): fixed sweep order p<q, rotations applied
    * until the off-diagonal Frobenius mass drops below 1e-20 or 50
    * sweeps — deterministic for a given input matrix. Returns
    * (eigenvalues, eigenvectors as rows), sorted descending by
    * eigenvalue (ties by original index), each vector sign-fixed so its
    * largest-|component| entry (first on ties) is positive.
    */
  def jacobiEig(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) { s += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      s
    }
    var sweep = 0
    while (sweep < 50 && off() > 1e-20) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      // deterministic sign: largest-|entry| (first index on ties) positive
      var best = 0
      var k = 1
      while (k < d) { if (math.abs(col(k)) > math.abs(col(best))) best = k; k += 1 }
      if (col(best) < 0) col.map(x => -x) else col
    }.toArray
    (vals, vecs)
  }

  /** Max |Σv − λv| entry — the eigenpair residual the q124 certificate
    * checks.
    */
  def eigResidual(cov: Array[Array[Double]], lam: Double,
      vec: Array[Double]): Double = {
    val d = cov.length
    var worst = 0.0
    var i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      while (j < d) { s += cov(i)(j) * vec(j); j += 1 }
      worst = math.max(worst, math.abs(s - lam * vec(i)))
      i += 1
    }
    worst
  }
}
