package graft.core

/** Clean-room Aho–Corasick multi-pattern matcher (Aho & Corasick, CACM
  * 1975) over raw UTF-8 BYTES: one automaton walk per subject string
  * counts EVERY occurrence of every pattern — including overlapping and
  * nested occurrences ("can" inside "scan" at the same end position) —
  * in O(|subject|) regardless of pattern count. This is the blocklist
  * primitive of URL/word screening stages (UT1-style lists run to tens of
  * thousands of fragments; scanning per-pattern would be O(|s|·|P|)).
  *
  * Representation: dense goto table (states × 256 ints) built breadth-
  * first with failure links folded INTO the table (a missing edge jumps
  * directly where the failure chain would land), and a per-state
  * occurrence count pre-summed down the suffix chain — the hot loop is
  * two array reads per input byte, no branching on misses.
  *
  * Memory: (total pattern bytes + 1) × 1 KiB. A 100k-byte blocklist is
  * ~100 MiB on the executor — build once per plan (the Expression holds
  * it as a broadcast-like reference object), never per row.
  */
final class AhoCorasick private (gotoTab: Array[Array[Int]],
    cnt: Array[Int]) extends Serializable {

  /** Total occurrences of all patterns in the byte string (overlapping
    * occurrences each counted; a pattern occurring at several positions
    * counted at each).
    */
  def count(s: Array[Byte]): Long = {
    var st = 0
    var total = 0L
    var i = 0
    while (i < s.length) {
      st = gotoTab(st)(s(i) & 0xFF)
      total += cnt(st)
      i += 1
    }
    total
  }

  def count(s: String): Long = count(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def states: Int = cnt.length
}

object AhoCorasick {

  /** Build from byte patterns. Empty patterns are rejected; duplicate
    * patterns are collapsed (each distinct pattern counted once per
    * occurrence).
    */
  def build(patternsIn: Seq[Array[Byte]]): AhoCorasick = {
    val patterns = patternsIn.map(_.toSeq).distinct.map(_.toArray)
    require(patterns.forall(_.nonEmpty), "empty blocklist pattern")
    val maxStates = patterns.map(_.length).sum + 1
    val gotoTab = Array.fill(maxStates)(Array.fill(256)(-1))
    val out = new Array[Int](maxStates)
    var nStates = 1
    // 1. trie
    patterns.foreach { p =>
      var st = 0
      p.foreach { b =>
        val c = b & 0xFF
        if (gotoTab(st)(c) < 0) { gotoTab(st)(c) = nStates; nStates += 1 }
        st = gotoTab(st)(c)
      }
      out(st) += 1
    }
    // 2. BFS failure links, folded into the table; cnt pre-summed down
    //    the suffix chain so the matcher never walks it
    val fail = new Array[Int](nStates)
    val cnt = new Array[Int](nStates)
    cnt(0) = out(0)
    val queue = new java.util.ArrayDeque[Int]()
    var c = 0
    while (c < 256) {
      val nxt = gotoTab(0)(c)
      if (nxt < 0) gotoTab(0)(c) = 0
      else { fail(nxt) = 0; queue.add(nxt) }
      c += 1
    }
    while (!queue.isEmpty) {
      val st = queue.poll()
      cnt(st) = out(st) + cnt(fail(st))
      var c = 0
      while (c < 256) {
        val nxt = gotoTab(st)(c)
        if (nxt < 0) gotoTab(st)(c) = gotoTab(fail(st))(c)
        else { fail(nxt) = gotoTab(fail(st))(c); queue.add(nxt) }
        c += 1
      }
    }
    new AhoCorasick(gotoTab.take(nStates), cnt)
  }

  def buildStrings(patterns: Seq[String]): AhoCorasick =
    build(patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
}
