package graft.core

import org.scalatest.funsuite.AnyFunSuite

class TextOffsetsSpec extends AnyFunSuite {

  /** Seeded mini property loop (scalatestplus bridge is not in the offline
    * cache; scalacheck generators are not needed for these simple domains).
    */
  private def forAllSeeded(alphabet: String)(check: String => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (0 until 300).foreach { _ =>
      val len = rnd.nextInt(40)
      val t = Array.fill(len)(alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
      check(t)
    }
  }

  test("page spans follow the \\f contract") {
    assert(TextOffsets.pageSpans("") == Vector(Span(0, 0)))
    assert(TextOffsets.pageSpans("ab") == Vector(Span(0, 2)))
    assert(TextOffsets.pageSpans("ab\fcd") == Vector(Span(0, 2), Span(3, 5)))
    assert(TextOffsets.pageSpans("a\f\fb") == Vector(Span(0, 1), Span(2, 2), Span(3, 4)))
  }

  test("line spans follow the \\n contract") {
    assert(TextOffsets.lineSpans("a\nbc\n") == Vector(Span(0, 1), Span(2, 4), Span(5, 5)))
  }

  test("page and line index") {
    val t = "ab\ncd\fef\ngh"
    assert(TextOffsets.pageIndex(t, 0) == 0)
    assert(TextOffsets.pageIndex(t, 7) == 1)
    assert(TextOffsets.lineIndex(t, 0) == 0)
    assert(TextOffsets.lineIndex(t, 4) == 1)
    assert(TextOffsets.lineIndex(t, 10) == 2)
  }

  // Goldens generated from the reference get_missing_offsets
  // (konfuzio_sdk/utils.py:693-749), including its boundary quirks.
  test("missing offsets reference goldens") {
    def mo(s: Int, e: Int, sp: (Int, Int)*): Vector[(Int, Int)] =
      TextOffsets.missingOffsets(s, e, sp.map(p => Span(p._1, p._2))).map(x => (x.start, x.end))
    assert(mo(0, 170, (66, 78), (159, 169)) == Vector((0, 66), (78, 159), (169, 170)))
    assert(mo(0, 10) == Vector((0, 10)))
    assert(mo(0, 10, (0, 10)) == Vector())
    assert(mo(0, 10, (0, 5)) == Vector((5, 10)))
    assert(mo(0, 10, (5, 10)) == Vector((0, 5)))
    assert(mo(0, 10, (3, 4)) == Vector((0, 3), (4, 10)))
    assert(mo(0, 10, (0, 1), (9, 10)) == Vector((1, 9)))
    assert(mo(0, 10, (2, 3), (5, 6)) == Vector((0, 2), (3, 5), (6, 10)))
    assert(mo(5, 20, (0, 8), (18, 25)) == Vector((8, 18)))
    assert(mo(0, 1) == Vector())           // reference quirk: 1-char interval yields nothing
    assert(mo(0, 3, (1, 2)) == Vector((0, 3))) // reference quirk: isolated boundary chars rejoin
  }

  test("splitAtLineBreaks never crosses \\n or \\f") {
    forAllSeeded("ab \n\f") { t =>
      TextOffsets.splitAtLineBreaks(t, 0, t.length).foreach { sp =>
        val s = t.substring(sp.start, sp.end)
        assert(!s.contains('\n') && !s.contains('\f'))
        assert(sp.end > sp.start)
      }
    }
  }

  test("tokenizer spans never cross a line") {
    forAllSeeded("xy \n\t\f") { t =>
      Rx.tokenSpans(t, Tokenizers.whitespace).foreach { sp =>
        val s = t.substring(sp.start, sp.end)
        assert(!s.exists(c => c == ' ' || c == '\n' || c == '\t' || c == '\f'))
      }
    }
  }
}
