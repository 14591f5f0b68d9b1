package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The Aho–Corasick matcher must count exactly what a naive per-pattern
  * sliding scan counts — every occurrence, overlapping and nested
  * included — on adversarial pattern sets (prefix-of-each-other, shared
  * suffixes, self-overlapping), byte-exactly on UTF-8 input.
  */
class AhoCorasickSpec extends AnyFunSuite {

  private def naive(s: String, pats: Seq[String]): Long = {
    val b = s.getBytes("UTF-8")
    pats.distinct.map { p =>
      val pb = p.getBytes("UTF-8")
      (0 to b.length - pb.length)
        .count(i => pb.indices.forall(j => b(i + j) == pb(j))).toLong
    }.sum
  }

  test("== naive counting on 1000 random subjects (overlap + nesting)") {
    val pats = Seq("a", "aa", "aba", "ab", "ba", "scan", "can", "an",
      "n-a", "-")
    val ac = AhoCorasick.buildStrings(pats)
    val rnd = new scala.util.Random(41)
    val alpha = "abcns-"
    for (_ <- 1 to 1000) {
      val s = Seq.fill(rnd.nextInt(60))(alpha(rnd.nextInt(alpha.length)))
        .mkString
      assert(ac.count(s) === naive(s, pats), s"subject '$s'")
    }
  }

  test("edges: empty subject, short subject, exact match, multi-byte UTF-8") {
    val ac = AhoCorasick.buildStrings(Seq("xyz", "é", "日本"))
    assert(ac.count("") === 0L)
    assert(ac.count("xy") === 0L)
    assert(ac.count("xyz") === 1L)
    assert(ac.count("ham é and 日本語 日本") === 3L)
    assert(ac.count("naïve bytes é") === 1L)
  }

  test("duplicate patterns collapse; empty pattern rejected") {
    val ac = AhoCorasick.buildStrings(Seq("ab", "ab", "b"))
    assert(ac.count("ab") === 2L) // "ab" once (deduped) + "b" once
    intercept[IllegalArgumentException](
      AhoCorasick.buildStrings(Seq("a", "")))
  }

  test("blocklist-sized set: 2000 patterns, one O(n) walk") {
    val pats = (0 until 2000).map(i => s"w${i}x")
    val ac = AhoCorasick.buildStrings(pats)
    val subject = (0 until 3000).map(i => s"w${i % 2500}x").mkString("-")
    assert(ac.count(subject) ===
      (0 until 3000).count(i => i % 2500 < 2000).toLong)
  }
}
