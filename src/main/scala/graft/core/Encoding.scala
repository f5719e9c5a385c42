package graft.core

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

/** Encoding hygiene for crawled text — the ftfy stage every web-text
  * pipeline runs first: repair UTF-8 bytes that were misdecoded as
  * Windows-1252 ("mojibake": `cafÃ©` → `café`, `â€œquotedâ€` →
  * `“quoted”`).
  *
  * The repair is the round-trip test: re-encode the string as CP1252 and
  * strictly decode the bytes as UTF-8. The CP1252 side uses the WHATWG
  * table (the one browsers and real-world decoders implement), where the
  * five undefined bytes 0x81/0x8D/0x8F/0x90/0x9D fall back to their C1
  * controls — Java's strict windows-1252 charset rejects those both ways,
  * but real mojibake is full of them (e.g. the 0x9D tail byte of a curly
  * close-quote ”), so the table is spelled out here instead of delegating
  * to `Charset.forName`. Both directions are all-or-nothing: the repair
  * applies only when the ENTIRE string is consistent with the misdecoding
  * story. Genuine non-ASCII text (a real `é` is the single byte 0xE9 under
  * CP1252, never a valid UTF-8 sequence head followed by a continuation)
  * fails the strict UTF-8 decode and passes through untouched. That
  * property is what makes the operator safe to run blind over a whole
  * corpus: a false repair requires the full text to accidentally form
  * valid non-ASCII UTF-8 through the CP1252 lens. Pure-ASCII strings
  * short-circuit (the overwhelmingly common case — zero allocation).
  *
  * Scale shape: a pure per-row scalar — runs inside the same narrow
  * mapPartitions stage as the rest of extraction; byte-identical at any
  * parallelism.
  */
object Encoding {

  /** WHATWG windows-1252 decode of bytes 0x80–0x9F (encoding.spec.whatwg.org);
    * undefined positions map to their C1 controls. Bytes 0x00–0x7F and
    * 0xA0–0xFF are identity (Latin-1).
    */
  private val Hi: Array[Char] = Array(
    0x20ac, 0x0081, 0x201a, 0x0192, 0x201e, 0x2026, 0x2020, 0x2021,
    0x02c6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008d, 0x017d, 0x008f,
    0x0090, 0x2018, 0x2019, 0x201c, 0x201d, 0x2022, 0x2013, 0x2014,
    0x02dc, 0x2122, 0x0161, 0x203a, 0x0153, 0x009d, 0x017e, 0x0178
  ).map(_.toChar)

  /** Inverse of the WHATWG table for the 0x80–0x9F block. */
  private val HiInv: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte](64)
    var i = 0
    while (i < Hi.length) { m.put(Hi(i), (0x80 + i).toByte); i += 1 }
    m
  }

  /** Encode one string through the WHATWG CP1252 lens; null when any char
    * has no CP1252 byte (all-or-nothing).
    */
  private def cp1252Bytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80) out(i) = c.toByte
      else {
        val hi = HiInv.get(c)
        if (hi != null) out(i) = hi.byteValue()
        else if (c >= 0xa0 && c <= 0xff) out(i) = c.toByte
        else return null
      }
      i += 1
    }
    out
  }

  /** One repair pass: Some(fixed) if the whole string CP1252-encodes and
    * strictly UTF-8-decodes to something different, None otherwise.
    */
  private def repairOnce(s: String): Option[String] = {
    val bytes = cp1252Bytes(s)
    if (bytes == null) return None
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val out = dec.decode(ByteBuffer.wrap(bytes)).toString
      if (out == s) None else Some(out)
    } catch {
      case _: CharacterCodingException => None
    }
  }

  /** Canonical text normalization — the Unicode-hygiene stage that runs
    * right after mojibake repair in a web-text pipeline:
    *
    *  - newline canonicalization: `\r\n` → `\n`, lone `\r` → `\n`, and
    *    `\f` → `\n` (the reference's own line-splitter convention,
    *    konfuzio_sdk information_extraction.py:1391–1396 maps form feeds
    *    to newlines before splitting);
    *  - strip format-layer invisibles that break tokenization and dedup
    *    (ZWSP U+200B, soft hyphen U+00AD, word joiner U+2060, BOM/ZWNBSP
    *    U+FEFF) — but NOT ZWNJ/ZWJ, which are orthographic in Persian and
    *    Indic scripts;
    *  - strip remaining C0 controls (except `\t`/`\n`), DEL, and the C1
    *    block 0x80–0x9F (mojibake residue; q96's repair emits none, but
    *    raw crawls carry them);
    *  - Unicode NFC composition (so `e`+U+0301 and `é` hash identically
    *    across the dedup stages).
    *
    * Scale shape: per-row scalar, single pass + an NFC call only when the
    * quick check fails; ASCII-after-strip text never allocates for NFC.
    */
  def normalizeText(s: String): String = {
    if (s == null) return null
    var sb: java.lang.StringBuilder = null
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val mapped: Int =
        if (c == '\r') { if (i + 1 < s.length && s.charAt(i + 1) == '\n') -2 else '\n' }
        else if (c == '\f') '\n'
        else if (c == 0x200b || c == 0x00ad || c == 0x2060 || c == 0xfeff) -1
        else if (c < 0x20 && c != '\t' && c != '\n') -1
        else if (c >= 0x7f && c <= 0x9f) -1
        else c
      if (sb == null && mapped != c) {
        sb = new java.lang.StringBuilder(s.length)
        sb.append(s, 0, i)
      }
      if (sb != null) mapped match {
        case -2 => // \r of a \r\n pair: drop, the \n follows
        case -1 => // stripped
        case m => sb.append(m.toChar)
      }
      i += 1
    }
    val swept = if (sb == null) s else sb.toString
    if (java.text.Normalizer.isNormalized(swept, java.text.Normalizer.Form.NFC)) swept
    else java.text.Normalizer.normalize(swept, java.text.Normalizer.Form.NFC)
  }

  /** Repair UTF-8-as-CP1252 mojibake, up to `maxPasses` nested layers
    * (double-encoded text — pasted mojibake re-crawled — repairs in two).
    * Returns the input unchanged when no full-string repair applies.
    */
  def repairMojibake(s: String, maxPasses: Int = 2): String = {
    if (s == null) return null
    // ASCII fast path: nothing to repair
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    var cur = s
    var pass = 0
    var changed = true
    while (changed && pass < maxPasses) {
      repairOnce(cur) match {
        case Some(fixed) => cur = fixed; pass += 1
        case None => changed = false
      }
    }
    cur
  }
}
