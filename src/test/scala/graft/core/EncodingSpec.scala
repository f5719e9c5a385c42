package graft.core

import org.scalatest.funsuite.AnyFunSuite

class EncodingSpec extends AnyFunSuite {

  /** Simulate the corruption: UTF-8 bytes misdecoded as WHATWG
    * windows-1252 (the browser table — undefined bytes fall back to C1
    * controls; Java's strict charset would map them to U+FFFD instead,
    * which is not what real-world mojibake looks like).
    */
  private def misdecode(clean: String): String = {
    val hi = Array(0x20ac, 0x0081, 0x201a, 0x0192, 0x201e, 0x2026, 0x2020,
      0x2021, 0x02c6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008d, 0x017d,
      0x008f, 0x0090, 0x2018, 0x2019, 0x201c, 0x201d, 0x2022, 0x2013,
      0x2014, 0x02dc, 0x2122, 0x0161, 0x203a, 0x0153, 0x009d, 0x017e,
      0x0178)
    new String(clean.getBytes("UTF-8").map { b =>
      val u = b & 0xff
      (if (u >= 0x80 && u <= 0x9f) hi(u - 0x80) else u).toChar
    })
  }

  test("classic single-layer mojibake repairs") {
    assert(Encoding.repairMojibake("cafÃ©") == "café")
    assert(Encoding.repairMojibake("nÂ° 5") == "n° 5")
    assert(Encoding.repairMojibake(misdecode("São Paulo — Braço")) ==
      "São Paulo — Braço")
  }

  test("curly quotes through the undefined-CP1252 0x9D byte") {
    // ” is UTF-8 E2 80 9D; 0x9D has no CP1252 glyph, so the misdecode
    // yields the C1 control U+009D — the repair must round-trip it.
    val moj = misdecode("“quoted” text")
    assert(moj.contains('\u009d'))
    assert(Encoding.repairMojibake(moj) == "“quoted” text")
  }

  test("genuine accented text passes through untouched") {
    // a real é is CP1252 0xE9 — a UTF-8 3-byte lead followed by ASCII,
    // never a valid sequence — so strict decode fails and no repair fires
    assert(Encoding.repairMojibake("résumé") == "résumé")
    assert(Encoding.repairMojibake("naïve café") == "naïve café")
    assert(Encoding.repairMojibake("日本語テキスト") == "日本語テキスト")
  }

  test("double-encoded mojibake repairs in two passes; capped by maxPasses") {
    val clean = "élan — “fin”"
    val once = misdecode(clean)
    val twice = misdecode(once)
    assert(Encoding.repairMojibake(once) == clean)
    assert(Encoding.repairMojibake(twice) == clean)
    assert(Encoding.repairMojibake(twice, maxPasses = 1) == once)
  }

  test("ASCII fast path returns the same reference; null-safe") {
    val s = "plain ascii text 123"
    assert(Encoding.repairMojibake(s) eq s)
    assert(Encoding.repairMojibake(null) == null)
    assert(Encoding.repairMojibake("") == "")
  }

  test("normalizeText: newline canonicalization (CRLF, CR, FF)") {
    assert(Encoding.normalizeText("a\r\nb\rc\fd") == "a\nb\nc\nd")
    assert(Encoding.normalizeText("tail\r") == "tail\n")
  }

  test("normalizeText: format invisibles stripped, ZWNJ/ZWJ preserved") {
    assert(Encoding.normalizeText("zero\u200bwidth\u00adsoft\u2060wj\ufeffbom") ==
      "zerowidthsoftwjbom")
    // orthographic joiners stay (Persian/Indic text breaks without them)
    assert(Encoding.normalizeText("a\u200cb\u200dc") == "a\u200cb\u200dc")
  }

  test("normalizeText: C0/C1 controls stripped except tab and newline") {
    assert(Encoding.normalizeText("a\u0007b\u0000 c") == "ab c")
    assert(Encoding.normalizeText("keep\ttab\nand nl") == "keep\ttab\nand nl")
    assert(Encoding.normalizeText("del\u007fc1\u0085x") == "delc1x")
  }

  test("normalizeText: NFC composition") {
    assert(Encoding.normalizeText("Cafe\u0301") == "Caf\u00e9")
    assert(Encoding.normalizeText("Caf\u00e9") == "Caf\u00e9")
  }

  test("normalizeText: ASCII identity returns the same reference; null-safe") {
    val s = "already clean ascii\twith\ttabs\n"
    assert(Encoding.normalizeText(s) eq s)
    assert(Encoding.normalizeText(null) == null)
    assert(Encoding.normalizeText("") == "")
  }

  test("characters outside CP1252 block the repair (all-or-nothing)") {
    // a CJK char cannot be a CP1252 misdecode artifact, so even if the
    // rest looks like mojibake the whole string is left alone
    assert(Encoding.repairMojibake("cafÃ© 漢") == "cafÃ© 漢")
  }
}
