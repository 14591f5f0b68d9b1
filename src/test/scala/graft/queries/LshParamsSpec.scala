package graft.queries

import org.scalatest.funsuite.AnyFunSuite

class LshParamsSpec extends AnyFunSuite {

  test("signBits keeps occupancy near target across corpus growth") {
    assert(LshParams.signBits(1000000L) === 14)     // 2^14=16384, occ ~61
    assert(LshParams.signBits(1000000000L) === 24)  // occ ~60
    assert(LshParams.signBits(1000000000000L) === 30) // clamped
    assert(LshParams.signBits(100L) === 8)          // floor clamp
    // occupancy is bounded at the chosen width (until the clamp)
    for (n <- Seq(10000L, 1000000L, 100000000L)) {
      val bits = LshParams.signBits(n, 64)
      assert(LshParams.occupancy(n, bits) <= 64.0 + 1e-9, s"n=$n bits=$bits")
      if (bits > 8) assert(LshParams.occupancy(n, bits - 1) > 64.0)
    }
  }

  test("minhashBands inverts the banding S-curve threshold") {
    assert(LshParams.minhashBands(0.8, 4) === 3)
    assert(LshParams.minhashBands(0.5, 4) === 16)
    assert(LshParams.minhashBands(0.9, 8) === 3)
    // round-trip: the resulting banding's threshold is at or below target,
    // except when the 64-band cost clamp engages (t^-r > 64)
    for (t <- Seq(0.5, 0.7, 0.9); r <- Seq(2, 4, 8)) {
      val b = LshParams.minhashBands(t, r)
      if (b < 64)
        assert(LshParams.bandThreshold(b, r) <= t + 1e-9, s"t=$t r=$r b=$b")
    }
  }
}
