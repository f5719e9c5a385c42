package graft.core

import java.lang.Character.UnicodeScript

/** Unicode-script profiling for crawled text: per-script letter counts, a
  * dominant-script verdict, and a homoglyph-spam signal (words mixing
  * Latin and Cyrillic letters — the classic confusable-obfuscation trick,
  * e.g. `pаypal` with a Cyrillic а). Complements [[LangId]]: language ID
  * needs letter n-grams, but script mixing is detectable even on short or
  * junk text, and mixed-script tokens are a strong spam/phish feature the
  * quality stage can filter on before any language model runs.
  *
  * Counts are per code point and use the Unicode Script property
  * (`Character.UnicodeScript`), the same property RE2's `\p{Latin}`
  * classes implement — which is what makes the operator's results
  * replayable in an independent SQL engine.
  *
  * Scale shape: a pure per-row scalar — one pass, no allocation beyond the
  * result; runs inside the same narrow stage as the rest of the quality
  * signals.
  */
object Script {

  /** Letter counts per script (digits counted separately — their script is
    * Common), whitespace-token count mixing Latin+Cyrillic, and the
    * dominant script (first of latin/cyrillic/greek/han/arabic/hangul/kana
    * in that order to reach the maximum; "none" when no scripted letter).
    */
  final case class Profile(latin: Long, cyrillic: Long, greek: Long,
      han: Long, arabic: Long, hangul: Long, kana: Long, digits: Long,
      confusableWords: Long, dominant: String)

  def profile(s: String): Profile = {
    if (s == null || s.isEmpty)
      return Profile(0, 0, 0, 0, 0, 0, 0, 0, 0, "none")
    var lat = 0L; var cyr = 0L; var grk = 0L; var han = 0L
    var ara = 0L; var hang = 0L; var kana = 0L; var dig = 0L
    var conf = 0L
    var wLat = false; var wCyr = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isWhitespace(cp)) {
        if (wLat && wCyr) conf += 1
        wLat = false; wCyr = false
      } else if (cp >= '0' && cp <= '9') {
        dig += 1
      } else {
        // unassigned code points have no script — treat as unscripted
        val sc =
          try UnicodeScript.of(cp)
          catch { case _: IllegalArgumentException => null }
        sc match {
          case UnicodeScript.LATIN => lat += 1; wLat = true
          case UnicodeScript.CYRILLIC => cyr += 1; wCyr = true
          case UnicodeScript.GREEK => grk += 1
          case UnicodeScript.HAN => han += 1
          case UnicodeScript.ARABIC => ara += 1
          case UnicodeScript.HANGUL => hang += 1
          case UnicodeScript.HIRAGANA | UnicodeScript.KATAKANA => kana += 1
          case _ =>
        }
      }
      i += Character.charCount(cp)
    }
    if (wLat && wCyr) conf += 1
    val dominant =
      if (lat + cyr + grk + han + ara + hang + kana == 0) "none"
      else if (lat >= math.max(cyr, math.max(grk, math.max(han,
        math.max(ara, math.max(hang, kana)))))) "latin"
      else if (cyr >= math.max(grk, math.max(han,
        math.max(ara, math.max(hang, kana))))) "cyrillic"
      else if (grk >= math.max(han, math.max(ara, math.max(hang, kana)))) "greek"
      else if (han >= math.max(ara, math.max(hang, kana))) "han"
      else if (ara >= math.max(hang, kana)) "arabic"
      else if (hang >= kana) "hangul"
      else "kana"
    Profile(lat, cyr, grk, han, ara, hang, kana, dig, conf, dominant)
  }
}
