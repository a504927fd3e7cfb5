package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure contract spec for [[RelationalScaleRehearsal]]'s closed-form
  * expected values: brute-force the generator's arithmetic at small n and
  * compare. No Spark — if these identities hold at n=10000 they hold at
  * any n ≡ 0 (mod 10000) because every form is periodic in blocks the
  * requirement makes whole. */
class RelationalRehearsalSpec extends AnyFunSuite {
  import RelationalScaleRehearsal._

  private val n = 10000L
  private val k = n / 50

  test("per-flag count, sum(qty), sum(price) match brute force") {
    for (f <- 0 until 4) {
      var cnt = 0L; var sq = 0L; var sp = BigInt(0)
      var id = f.toLong
      while (id < n) {
        cnt += 1; sq += id % 50 + 1; sp += id % M + 1
        id += 4
      }
      assert(cnt == expFlagCount(n), s"flag $f count")
      assert(sq == expFlagSumQty(n, f), s"flag $f sum qty")
      assert(sp == expFlagSumPrice(n, f), s"flag $f sum price")
    }
  }

  test("per-seg joined count and sum(qty) match brute force") {
    val cnt = Array.fill(10)(0L)
    val sq = Array.fill(10)(0L)
    var id = 0L
    while (id < n) {
      val seg = ((id % k) % 10).toInt
      cnt(seg) += 1; sq(seg) += id % 50 + 1
      id += 1
    }
    for (s <- 0 until 10) {
      assert(cnt(s) == expSegCount(n), s"seg $s count")
      assert(sq(s) == expSegSumQty(n, s), s"seg $s sum qty")
    }
  }

  test("price closed form crosses a full M-cycle when n/4 > M") {
    // n = 4(M + 7): each flag class has M+7 members — one complete walk of
    // all M residues plus a 7-term partial; brute-force the partial path
    val n2 = 4L * (M + 7)
    for (f <- 0 until 4) {
      var sp = BigInt(0)
      var id = f.toLong
      var i = 0L
      while (i < M + 7) { sp += id % M + 1; id += 4; i += 1 }
      assert(sp == expFlagSumPrice(n2, f), s"flag $f full-cycle sum price")
    }
  }
}
