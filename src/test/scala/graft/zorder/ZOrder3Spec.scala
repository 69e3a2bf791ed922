package graft.zorder

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Property laws for the 3-D Morton codec: the mask ladder must agree
  * with a naive per-bit interleave, invert exactly, and preserve the
  * octree prefix structure. */
class ZOrder3Spec extends AnyFunSuite {
  import ZOrder3._

  private val coord: Gen[Int] = Gen.oneOf(
    Gen.chooseNum(0, MaxCoord),
    Gen.oneOf(0, 1, 2, 1023, 1024, MaxCoord, MaxCoord - 1))

  private def forAll3(f: (Int, Int, Int) => Unit): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500)
        .withInitialSeed(Seed(42L)),
      Prop.forAll(coord, coord, coord)((a, b, c) => { f(a, b, c); true }))
    assert(res.passed, res.status.toString)
  }

  /** Independent reference: interleave bit by bit. */
  private def naive(x: Int, y: Int, t: Int): Long =
    (0 until 21).foldLeft(0L) { (acc, i) =>
      acc |
        (((x >> i) & 1).toLong << (3 * i + 2)) |
        (((y >> i) & 1).toLong << (3 * i + 1)) |
        (((t >> i) & 1).toLong << (3 * i))
    }

  test("mask ladder equals the naive per-bit interleave") {
    forAll3 { (x, y, t) => assert(zorder3(x, y, t) == naive(x, y, t)) }
  }

  test("unzorder3 inverts zorder3 exactly; keys are non-negative") {
    forAll3 { (x, y, t) =>
      val z = zorder3(x, y, t)
      assert(z >= 0L)
      assert(unzorder3(z) == ((x, y, t)))
    }
  }

  test("octree prefix: sharing the top k bits of all coords => sharing a 3k key prefix") {
    forAll3 { (x, y, t) =>
      val k = 7 // fix top-7 bits, vary the rest
      val mask = ~((1 << (21 - k)) - 1)
      val z1 = zorder3(x, y, t)
      val z2 = zorder3(x & mask, y & mask, t & mask)
      val keyMask = -1L << (63 - 3 * k)
      assert((z1 & keyMask) == (z2 & keyMask))
    }
  }
}
