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
