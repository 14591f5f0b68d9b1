package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** [[GaleChurch]] against an independent exponential brute force: the DP
  * must return a structurally valid alignment whose cost equals the true
  * minimum over ALL legal alignments, and the planted hand-solved cases
  * must come out block-for-block.
  */
class GaleChurchSpec extends AnyFunSuite {
  import GaleChurch.{Block, align, alignCost, lengthCost}

  private val moves =
    Seq((1, 1, 0), (1, 0, 450), (0, 1, 450), (2, 1, 230), (1, 2, 230),
      (2, 2, 440))

  /** Exponential enumeration of the minimal alignment cost — written
    * forward (from (0,0)) where the DP runs backward, so a shared
    * indexing bug cannot cancel out.
    */
  private def bruteMin(a: Array[Int], b: Array[Int]): Int = {
    def go(i: Int, j: Int): Int =
      if (i == a.length && j == b.length) 0
      else moves.collect {
        case (da, db, pen) if i + da <= a.length && j + db <= b.length =>
          val la = a.slice(i, i + da).sum
          val lb = b.slice(j, j + db).sum
          pen + lengthCost(la, lb) + go(i + da, j + db)
      }.min
    go(0, 0)
  }

  private def costOf(a: Array[Int], b: Array[Int], blocks: Array[Block]): Int =
    blocks.map { bl =>
      val pen = moves.find(m => m._1 == bl.na && m._2 == bl.nb).get._3
      pen + lengthCost(
        a.slice(bl.ai, bl.ai + bl.na).sum, b.slice(bl.bi, bl.bi + bl.nb).sum)
    }.sum

  test("hand-solved planted alignments") {
    assert(align(Array(100, 50, 60), Array(102, 108)).toSeq ===
      Seq(Block(0, 0, 1, 1), Block(1, 1, 2, 1)))
    assert(align(Array(80, 80), Array(82, 81)).toSeq ===
      Seq(Block(0, 0, 1, 1), Block(1, 1, 1, 1)))
    assert(align(Array(100, 50), Array.empty[Int]).toSeq ===
      Seq(Block(0, 0, 1, 0), Block(1, 0, 1, 0)))
    assert(align(Array(200), Array(98, 99)).toSeq ===
      Seq(Block(0, 0, 1, 2)))
    assert(align(Array.empty[Int], Array.empty[Int]).isEmpty)
  }

  test("DP alignment is valid, tiles both sequences, and is optimal " +
    "(brute-force equality over random small inputs)") {
    val gen = for {
      na <- Gen.choose(0, 6); nb <- Gen.choose(0, 6)
      a <- Gen.listOfN(na, Gen.choose(1, 300))
      b <- Gen.listOfN(nb, Gen.choose(1, 300))
    } yield (a.toArray, b.toArray)
    val prop = Prop.forAll(gen) { case (a, b) =>
      val blocks = align(a, b)
      // tiling: consecutive, complete, 0-based
      var ai = 0
      var bi = 0
      val tiled = blocks.forall { bl =>
        val ok = bl.ai == ai && bl.bi == bi &&
          moves.exists(m => m._1 == bl.na && m._2 == bl.nb)
        ai += bl.na
        bi += bl.nb
        ok
      } && ai == a.length && bi == b.length
      // optimality: block cost == DP cost == brute-force minimum
      val c = costOf(a, b, blocks)
      tiled && c == alignCost(a, b) && c == bruteMin(a, b)
    }
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop).passed)
  }

  test("determinism: same input twice gives identical blocks") {
    val a = Array(40, 200, 3, 77, 140)
    val b = Array(45, 190, 80, 139)
    assert(align(a, b).toSeq === align(a, b).toSeq)
  }
}
