package graft.engine

import graft.corpus.WebCorpus
import org.scalatest.funsuite.AnyFunSuite

/** Pinned end-to-end extraction goldens — the engine analogue of the
  * reference's exact `entity_results_data` tuples
  * (tests/trainer/test_information_extraction.py:78-99): exact text sha,
  * token count, simhash, and every labeled (label, start, end, text,
  * normalized) tuple for a fixed url. Any behavioral drift in the
  * html→tokenize→score→merge chain fails here byte-exactly.
  */
class GoldenExtractionSpec extends AnyFunSuite {

  test("multiline golden: an amount column vertical-merges in the flagship path") {
    // M4 wired into extractOne (information_extraction.py:3398-3408): two
    // amounts stacked alone in their x-band merge into one multiline
    // extraction; the surrounding single-line labels are untouched
    val text = "Betrag\n1234,56\n789,01\nEnde am 07.12.2006"
    val doc = Extraction.extractOne(PageRow("u", null, Array.empty[Byte], text, ""))
    val got = doc.labels.map(l => (l.label, l.start, l.end, l.text, l.normalized)).toVector
    // the merged annotation keeps its PER-LINE member spans (two rows, own
    // slices, shared annotation-level normalized = the joined member text)
    assert(got == Vector(
      ("amount", 7, 14, "1234,56", "1234,56\n789,01"),
      ("amount", 15, 21, "789,01", "1234,56\n789,01"),
      ("date", 30, 40, "07.12.2006", "2006-12-07"),
    ))
  }

  test("multiline golden: member spans never include foreign inter-line content") {
    // amounts x-overlap and merge, but other words share their lines: each
    // emitted span must cover ONLY its own amount slice
    val text = "Item A 10,00\nItem B 20,00"
    val doc = Extraction.extractOne(PageRow("u", null, Array.empty[Byte], text, ""))
    val amounts = doc.labels.filter(_.label == "amount").toVector
    assert(amounts.map(_.text) == Vector("10,00", "20,00"))
    assert(amounts.forall(a => !a.text.contains("Item")))
    assert(amounts.map(_.normalized).distinct == Vector("10,00\n20,00")) // merged annotation value
  }

  test("multiline amounts mid-sentence do NOT merge (foreign chars block)") {
    val text = "Preis 1234,56 EUR heute\nWert 789,01 EUR morgen"
    val doc = Extraction.extractOne(PageRow("u", null, Array.empty[Byte], text, ""))
    val amounts = doc.labels.filter(_.label == "amount").toVector
    assert(amounts.length == 2)
    assert(amounts.map(_.normalized).sorted == Vector("1234.56", "789.01"))
  }

  test("page 3 golden tuples are byte-exact") {
    val p = WebCorpus.page(3L)
    val doc = Extraction.extractOne(PageRow(p.url, p.warc_ts, p.html, p.text, p.lang))
    assert(doc.url == "https://big-portal-0.example.com/page/3")
    assert(doc.text_sha256 == "c657e19d690c85796d270dc146cb5d1c456dc1df61632137e2602d97813c097b")
    assert(doc.n_tokens == 84)
    assert(doc.simhash == 2946551104888806864L)
    val got = doc.labels.map(l => (l.label, l.start, l.end, l.text, l.normalized)).toVector
    assert(got == Vector(
      ("amount", 104, 111, "6596,70", "6596.7"),
      ("date", 193, 203, "07.12.2006", "2006-12-07"),
      ("email", 303, 329, "contact76@corp.example.com", "contact76@corp.example.com"),
    ))
  }

  test("golden text equals the embedded main text") {
    val p = WebCorpus.page(3L)
    val doc = Extraction.extractOne(PageRow(p.url, p.warc_ts, p.html, p.text, p.lang))
    assert(doc.extracted_text == WebCorpus.mainText(p.url))
  }
}
