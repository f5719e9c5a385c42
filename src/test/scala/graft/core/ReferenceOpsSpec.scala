package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Specs for the long-tail reference operators (F4, R10, R12, X2, X6, X7, M5). */
class ReferenceOpsSpec extends AnyFunSuite {

  test("F4: clamp span to page bounds") {
    val page = Span(10, 20)
    assert(TextOffsets.clampToPage(Span(5, 15), page).contains(Span(10, 15)))
    assert(TextOffsets.clampToPage(Span(12, 18), page).contains(Span(12, 18)))
    assert(TextOffsets.clampToPage(Span(0, 5), page).isEmpty)
    assert(TextOffsets.clampToPage(Span(25, 30), page).isEmpty)
  }

  test("R10: context proposals generalize surroundings and dedupe") {
    val text = "Ref: INV-1234 due"
    val start = text.indexOf("INV-")
    val proposals = RegexGen.contextProposals(text, start, start + 8, "(?P<Label_1_N_1_5>INV[-]\\d\\d\\d\\d)")
    assert(proposals.nonEmpty)
    // each proposal must still match the source text
    proposals.foreach { p =>
      val cp = CompiledPattern.compile(p)
      assert(cp.pattern.matcher(text).find(), s"proposal $p must match")
    }
  }

  test("R12: candidate split covers the text") {
    val (cands, other, spans) = RegexGen.candidateSplit("a 12 b 34 c", "\\d+")
    assert(cands == Vector("12", "34"))
    assert(other == Vector("a ", " b ", " c"))
    assert(spans == Vector(Span(2, 4), Span(7, 9)))
    // reassembling candidates+other restores the text
    val rebuilt = other.head + cands.zip(other.tail).map { case (c, o) => c + o }.mkString
    assert(rebuilt == "a 12 b 34 c")
  }

  test("R12: nested capture groups degrade like Python slicing, not throw") {
    // group spans emit in definition order (outer then inner): the inner
    // span starts BEFORE the walker's previous end — Python's
    // doctext[prev:start] yields '' there (regex.py:283-286)
    val (cands, other, spans) = RegexGen.candidateSplit("abcd e", "(?P<a>ab(?P<b>c)d)")
    assert(cands == Vector("abcd", "c"))
    assert(spans == Vector(Span(0, 4), Span(2, 3)))
    assert(other == Vector("", "", "d e"))
  }

  test("R10: near-head annotations get an EMPTY before-context in long docs (negative-slice parity)") {
    // reference: text[start - spacer² : start] with a negative begin
    // resolves from the END of the text (data.py:2229-2231) — for a long
    // doc that is an empty prefix, NOT the clamped head of the document
    val text = ("x" * 200) + " INV-1234 due"
    val headText = "INV-1234 " + ("y" * 300)
    val fromHead = RegexGen.contextProposals(headText, 0, 8, "(?P<L>INV[-]\\d{4})")
    // spacer²=4/25/100 all exceed start=0 → before must be "" in all three
    fromHead.foreach(p => assert(p.startsWith("(?P<L>"), s"unexpected before-context in $p"))
    val mid = RegexGen.contextProposals(text, 201, 209, "(?P<L>INV[-]\\d{4})")
    assert(mid.exists(!_.startsWith("(?P<L>")), "mid-doc annotations DO get before-context")
  }

  test("R10: catch-all proposals are rejected by the findings-per-page guard") {
    // a proposal whose context generalizes to near-everything must be
    // dropped before evaluation (data.py:2244-2251)
    val text = "a " * 300
    val got = RegexGen.contextProposals(text, 2, 3, "(?P<L>[a-z])", maxFindingsPerPage = 10)
    assert(got.isEmpty, s"degenerate proposals survived: $got")
    val kept = RegexGen.contextProposals(text, 2, 3, "(?P<L>[a-z])", maxFindingsPerPage = 0)
    assert(kept.nonEmpty, "guard disabled -> proposals flow")
  }

  test("X2: spatial features relative to page") {
    val b = Geometry.Box(10, 20, 30, 40, page = 1, line = 3)
    val f = Geometry.spatialFeatures(b, pageW = 100, pageH = 200, nPages = 4)
    assert(f.area == 100.0)
    assert(f.areaQuadrantTwo == 300.0)
    assert(f.x0Rel == 0.1 && f.x1Rel == 0.2)
    assert(f.y0Rel == 0.15 && f.y1Rel == 0.2)
    assert(f.relativePositionInPage == 0.25)
  }

  test("X6: catchphrase line distances") {
    val lines = Vector("Gross pay details", "some text", "Net total", "amount 5")
    assert(Features.catchphraseDistances(lines, 3, Seq("Gross", "Net", "Missing")) ==
      Vector(3, 1, -1))
  }

  test("X7: word on page") {
    assert(Features.wordOnPage("page text with total", "total") == 1)
    assert(Features.wordOnPage("page text", "total") == 0)
  }

  test("M5: split multiline extraction at line breaks") {
    val text = "line one\nline two"
    val row = graft.engine.Scorer.Scored(Span(5, 13), "x", 0.9, "")
    val parts = graft.engine.Merge.splitMultiline(text, row)
    assert(parts.map(p => (p.span.start, p.span.end)) == Vector((5, 8), (9, 13)))
    assert(parts.map(_.normalized) == Vector("one", "line"))
  }

  test("C8: combined label split") {
    assert(graft.engine.Evaluate.splitCombinedLabel("Payslip__GrossPay") == ("Payslip", "GrossPay"))
    assert(graft.engine.Evaluate.splitCombinedLabel("Plain") == ("", "Plain"))
  }
}
