package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Gopher filter statistics (Quality.gopher): each rule's counter on
  * hand-computed texts, the integerized keep inequalities, and the
  * definitions the SQL oracle replays (replace-count ellipses, no-trim
  * bullet detection, distinct-stopword hits).
  */
class QualityGopherSpec extends AnyFunSuite {

  test("word/char/line counters on a plain two-line text") {
    val g = Quality.gopher("the cat sat\non the mat")
    assert(g.nWords == 6)
    assert(g.wordChars == 3 + 3 + 3 + 2 + 3 + 3)
    assert(g.nLines == 2)
    assert(g.alphaWords == 6)
    assert(g.stopwordHits == 1) // only "the", counted once despite 2 uses
  }

  test("symbol counts: '#' occurrences and non-overlapping '...' runs") {
    val g = Quality.gopher("a # b ## c ...... d ....")
    assert(g.hashCount == 3)
    // "......" = 2 non-overlapping, "...." = 1 (replace-count semantics)
    assert(g.ellipsisCount == 3)
  }

  test("bullet lines match on first char only, no trimming") {
    val g = Quality.gopher("- one\n* two\n• three\n - indented is NOT a bullet\nplain")
    assert(g.bulletLines == 3)
    assert(g.nLines == 5)
  }

  test("ellipsis lines: ASCII '...' suffix or unicode '…'") {
    val g = Quality.gopher("ends well.\nends open...\nends uni…\n...starts only")
    assert(g.ellipsisLines == 2)
  }

  test("empty lines are not counted; empty text is all zeros") {
    assert(Quality.gopher("a\n\n\nb").nLines == 2)
    assert(Quality.gopher("") == Quality.Gopher(0, 0, 0, 0, 0, 0, 0, 0, 0))
    assert(Quality.gopher(null) == Quality.Gopher(0, 0, 0, 0, 0, 0, 0, 0, 0))
  }

  test("stopword hits are DISTINCT members of the 8-word list, case-folded") {
    val g = Quality.gopher("The THE the to To and of that have with be")
    assert(g.stopwordHits == 8)
    assert(Quality.gopher("apple banana").stopwordHits == 0)
  }

  test("alphaWords counts ASCII letters only") {
    val g = Quality.gopher("abc 123 a1 42 ...")
    assert(g.nWords == 5)
    assert(g.alphaWords == 2)
  }

  test("keep: a healthy document passes, each planted defect fails it") {
    // 60 words of mean length in band, stopwords present
    val good = (1 to 58).map(i => "word" + (i % 10)).mkString(" ") + " the and"
    assert(Quality.gopher(good).keep)
    // under the 50-word floor
    assert(!Quality.gopher("the and short").keep)
    // symbol ratio: 7 hashes on 60 words > 10%
    assert(!Quality.gopher(good + " # # # # # # #").keep)
    // mean word length above 10: same words stretched
    val longWords = (1 to 58).map(_ => "wordwordwordword").mkString(" ") + " thethethethe andandandand"
    assert(!Quality.gopher(longWords).keep)
    // alpha ratio: 20 numeric words on 80 total < 80% alpha
    val numeric = good + " " + (1 to 20).map(i => (10000 + i).toString).mkString(" ")
    assert(!Quality.gopher(numeric).keep)
    // fewer than 2 distinct stopwords
    val noStop = (1 to 60).map(i => "word" + (i % 10)).mkString(" ")
    assert(!Quality.gopher(noStop).keep)
  }

  test("keep: line-ratio rules — >90% bullets fails, >30% ellipsis fails") {
    val body = (1 to 58).map(i => "word" + (i % 10)).mkString(" ") + " the and"
    // 10 lines, all bullets → 10*10 > 9*10
    val allBullets = body + "\n" + (1 to 10).map(i => s"- item$i").mkString("\n")
    assert(!Quality.gopher(allBullets).keep)
    // 10 lines, 4 ellipsis-terminated → 40 > 30
    val manyEllipsis = body + "\n" + (1 to 10).map(i =>
      if (i <= 4) s"line$i..." else s"line$i.").mkString("\n")
    assert(!Quality.gopher(manyEllipsis).keep)
    // 10 lines, 3 ellipsis → exactly 30% passes (boundary inclusive)
    val okEllipsis = body + "\n" + (1 to 10).map(i =>
      if (i <= 3) s"line$i..." else s"line$i.").mkString("\n")
    assert(Quality.gopher(okEllipsis).keep)
  }
}
