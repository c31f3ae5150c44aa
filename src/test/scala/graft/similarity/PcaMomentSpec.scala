package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cast assumption the PCA float contract rests on
  * (SimilarityQueries q_embed_pca scaladoc): the covariance integers
  * n·P − S·S exceed 2⁵³ as the corpus grows, so the BigInt→double
  * cast is no longer exact and cross-engine equality requires it to
  * be CORRECTLY ROUNDED (round-half-even to the nearest representable
  * double) — matching DuckDB's HUGEINT→DOUBLE. This spec verifies
  * Scala `BigInt.toDouble` directly against the definition: the
  * chosen double's exact integer value is at least as close to the
  * source as both neighboring doubles, and exact ties go to the even
  * mantissa. No JDK conversion is used as the reference — neighbors
  * come from nextUp/nextDown and exactness from the
  * `new java.math.BigDecimal(double)` binary-exact constructor. */
class PcaMomentSpec extends AnyFunSuite {

  private def exact(d: Double): BigInt =
    new java.math.BigDecimal(d).toBigInteger // binary-exact for integral doubles

  private def assertCorrectlyRounded(v: BigInt): Unit = {
    val d = v.toDouble
    assert(!d.isInfinite, s"$v overflowed to infinity")
    val (dn, up) = (Math.nextDown(d), Math.nextUp(d))
    val err = (v - exact(d)).abs
    val errDn = (v - exact(dn)).abs
    val errUp = (v - exact(up)).abs
    assert(err <= errDn && err <= errUp,
      s"BigInt($v).toDouble = $d is not nearest (down $dn err $errDn, up $up err $errUp)")
    // exact tie ⇒ the mantissa must be even (IEEE round-half-even)
    if (err == errDn || err == errUp)
      assert((java.lang.Double.doubleToLongBits(d) & 1L) == 0L,
        s"halfway value $v rounded to odd-mantissa double $d")
  }

  test("BigInt.toDouble is correctly rounded above 2^53 (moment-sized values)") {
    val rnd = new scala.util.Random(14)
    // n·P-shaped magnitudes: n ~ 1e5..1e9 docs, per-cell P ~ 2^40..2^60
    val samples = Seq.tabulate(2000) { _ =>
      val bits = 54 + rnd.nextInt(60) // 2^54 .. 2^113
      BigInt(bits, rnd).setBit(bits - 1) * (if (rnd.nextBoolean()) 1 else -1)
    }
    samples.foreach(assertCorrectlyRounded)
  }

  test("exact halfway points round to even, both signs") {
    // for d in [2^k, 2^k+1) with k >= 53 doubles are spaced 2^(k-52);
    // the midpoint between consecutive doubles is an exact integer —
    // the adversarial case where truncation or half-up would differ
    val rnd = new scala.util.Random(41)
    (0 until 500).foreach { _ =>
      val k = 53 + rnd.nextInt(70)
      val d = BigInt(53, rnd).setBit(52).toDouble * BigInt(2).pow(k - 52).toDouble
      val mid = (exact(d) + exact(Math.nextUp(d))) / 2
      assert((exact(d) + exact(Math.nextUp(d))) % 2 == 0, "midpoint not integral")
      assertCorrectlyRounded(mid)
      assertCorrectlyRounded(-mid)
    }
  }
}
