package graft

import org.scalatest.funsuite.AnyFunSuite

/** The rehearsal's exact-count checks are only as good as the planted-
  * class contract of the corpus generator — lock it. `textFor` is a pure
  * function of the id, so these run without Spark. */
class TextScaleRehearsalSpec extends AnyFunSuite {
  import TextScaleRehearsal.textFor

  test("exact-dup class: id%100==99 is byte-identical to id-2") {
    for (base <- Seq(99L, 1099L, 70399L))
      assert(textFor(base) == textFor(base - 2))
  }

  test("near-dup class: id%100==98 is id-4 plus exactly one appended token") {
    for (id <- Seq(98L, 2098L, 31398L)) {
      assert(textFor(id) == textFor(id - 4) + " zedited")
      // the edit adds exactly one distinct trigram -> Jaccard D/(D+1)
      def tri(s: String) = s.split(' ').sliding(3).map(_.mkString(" ")).toSet
      val (a, b) = (tri(textFor(id - 4)), tri(textFor(id)))
      assert((b diff a).size == 1 && (a diff b).isEmpty)
    }
  }

  test("spam class: id%1000==0 has 10 tokens (fails C4's length rule alone)") {
    for (id <- Seq(0L, 1000L, 457000L))
      assert(textFor(id).split(' ').length == 10)
  }

  test("boilerplate class: id%100==3 ends with the fixed footer; its 3 interior trigrams are shared") {
    val footer = " visit zour zgreat zsite ztoday"
    assert(textFor(3L).endsWith(footer) && textFor(40103L).endsWith(footer))
    // interior trigrams (those fully inside the footer) are identical
    // across boilerplate docs -> hub shingles with df = |class|
    def tri(s: String) = s.split(' ').sliding(3).map(_.mkString(" ")).toSet
    val shared = tri(textFor(3L)) intersect tri(textFor(40103L))
    assert(Set("visit zour zgreat", "zour zgreat zsite", "zgreat zsite ztoday")
      .subsetOf(shared))
  }

  test("plain classes are disjoint from planted ones and deterministic") {
    // bases used by the dup classes are themselves plain docs
    for (id <- Seq(97L, 94L, 1L, 42L)) {
      assert(textFor(id) == textFor(id)) // pure function
      val n = textFor(id).split(' ').length
      assert(n >= 30 && n <= 69)
    }
  }
}
