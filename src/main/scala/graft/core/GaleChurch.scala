package graft.core

/** Gale–Church sentence alignment (Gale & Church, Computational
  * Linguistics 19(1), 1993) as an exact-integer dynamic program.
  *
  * The classic aligner scores a candidate segment pair by a match-type
  * prior plus a length-mismatch term. The match-type penalties are the
  * paper's own integer constants (−100·log prob, Table 5): 1–1 → 0,
  * 1–0/0–1 → 450, 2–1/1–2 → 230, 2–2 → 440. The length term is replaced
  * by the integer-exact surrogate `200·|la−lb| / (la+lb+1)` (monotone in
  * the normalized length mismatch, 0 ≤ cost < 200) so the whole DP is
  * deterministic integer arithmetic — no float δ, no platform drift, and
  * the same alignment on every JVM and under every partitioning.
  *
  * Ties break by fixed move order (1–1, 1–0, 0–1, 2–1, 1–2, 2–2): a later
  * move must be STRICTLY cheaper to win, making the backtrace unique.
  *
  * Inputs are the sentence byte/char lengths of the two documents; the
  * caller caps array sizes (the DP is O(n·m) time, O(n·m) bytes for the
  * move table) — at the production scale the aligner runs per candidate
  * pair AFTER the q175 length-ratio gate, never on unbounded documents.
  */
object GaleChurch {

  /** One aligned block: `na` sentences of A starting at `ai` align with
    * `nb` sentences of B starting at `bi` (0-based; na/nb in 0..2, not
    * both 0).
    */
  final case class Block(ai: Int, bi: Int, na: Int, nb: Int)

  val MaxSentences = 4096

  // (da, db, penalty) in tie-break order — Gale & Church Table 5.
  private val Moves: Array[(Int, Int, Int)] = Array(
    (1, 1, 0), (1, 0, 450), (0, 1, 450),
    (2, 1, 230), (1, 2, 230), (2, 2, 440))

  /** Integer length-mismatch cost for a block with summed lengths la, lb. */
  @inline def lengthCost(la: Int, lb: Int): Int =
    (200 * Math.abs(la - lb)) / (la + lb + 1)

  /** Total cost of one move ending at (i, j) (1-based prefix lengths). */
  @inline private def moveCost(
      a: Array[Int], b: Array[Int], i: Int, j: Int,
      da: Int, db: Int, pen: Int): Int = {
    var la = 0
    var k = i - da
    while (k < i) { la += a(k); k += 1 }
    var lb = 0
    k = j - db
    while (k < j) { lb += b(k); k += 1 }
    pen + lengthCost(la, lb)
  }

  /** Minimal alignment cost (the DP objective), for certification. */
  def alignCost(a: Array[Int], b: Array[Int]): Int = dp(a, b)._1

  /** The unique min-cost (tie-break-ordered) alignment as blocks in
    * forward order. Empty inputs align to the 1–0/0–1 spine.
    */
  def align(a: Array[Int], b: Array[Int]): Array[Block] = {
    val (_, move) = dp(a, b)
    val n = a.length
    val m = b.length
    var i = n
    var j = m
    var out = List.empty[Block]
    while (i > 0 || j > 0) {
      val mv = Moves(move(i * (m + 1) + j))
      i -= mv._1
      j -= mv._2
      out = Block(i, j, mv._1, mv._2) :: out
    }
    out.toArray
  }

  /** Bottom-up DP; returns (total cost, move-choice table). */
  private def dp(a: Array[Int], b: Array[Int]): (Int, Array[Byte]) = {
    val n = a.length
    val m = b.length
    require(n <= MaxSentences && m <= MaxSentences,
      s"gale_church input over $MaxSentences sentences: $n x $m")
    val w = m + 1
    val cost = new Array[Int]((n + 1) * w)
    val move = new Array[Byte]((n + 1) * w)
    val Inf = Int.MaxValue / 2
    var i = 0
    while (i <= n) {
      var j = 0
      while (j <= m) {
        if (i != 0 || j != 0) {
          var best = Inf
          var bestMv = -1
          var mi = 0
          while (mi < Moves.length) {
            val (da, db, pen) = Moves(mi)
            if (i >= da && j >= db) {
              val c = cost((i - da) * w + (j - db)) +
                moveCost(a, b, i, j, da, db, pen)
              if (c < best) { best = c; bestMv = mi }
            }
            mi += 1
          }
          cost(i * w + j) = best
          move(i * w + j) = bestMv.toByte
        }
        j += 1
      }
      i += 1
    }
    (cost(n * w + m), move)
  }
}
