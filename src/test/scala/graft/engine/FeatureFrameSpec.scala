package graft.engine

import graft.core.{Geometry, Span}
import org.scalatest.funsuite.AnyFunSuite

/** X8 assembled feature frame: width/order contract of the reference
  * (tests/trainer/test_information_extraction.py:296-299, 345-351) plus a
  * hand-computed golden row on the synthetic char grid.
  */
class FeatureFrameSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("width and order contract: 270 at n=2, 1102 at n=10") {
    val names2 = FeatureFrame.featureNames(2, 2)
    assert(names2.length == 270)
    assert(names2(42) == "feat_substring_count_h")
    assert(names2.last == "first_word_y1")
    assert(names2.distinct.length == names2.length) // no duplicate columns
    val names10 = FeatureFrame.featureNames(10, 10)
    assert(names10.length == 1102)
    assert(names10.last == "first_word_y1")
    // cross-line variant adds l_pos*/r_pos* keys after the dist keys
    val across = FeatureFrame.featureNames(2, 2, acrossLines = true)
    assert(across.length == 274)
    assert(across.indexOf("l_pos0") == across.indexOf("l_dist1") + 1)
  }

  private val text = "ab cd ef\nxy z 12,3"
  private val tokens = IndexedSeq(Span(0, 2), Span(3, 5), Span(6, 8), Span(9, 11), Span(12, 13), Span(14, 18))
  private val chars = Geometry.syntheticCharBoxes(text)
  private def idx(name: String, names: Vector[String]) = {
    val i = names.indexOf(name); assert(i >= 0, s"$name missing"); i
  }

  test("hand-computed golden row on the synthetic grid") {
    val names = FeatureFrame.featureNames(2, 2)
    val rows = FeatureFrame.assembleDoc(text, chars, tokens, tokens)
    assert(rows.length == tokens.length)
    val cd = rows(1)
    assert(cd.offsetString == "cd")
    val f = cd.features
    assert(f.length == 270)
    def v(n: String) = f(idx(n, names))
    // string features of "cd"
    assert(v("feat_len") == 2.0 && v("feat_vowel_len") == 0.0 && v("feat_substring_count_c") == 1.0)
    // grid box: cols 3-4 on line 1 -> x0=18, x1=30, y in [782,792]
    assert(v("x0") == 18.0 && v("x1") == 30.0 && v("y0") == 782.0 && v("y1") == 792.0)
    assert(v("page_index") == 0.0 && v("area_quadrant_two") == 18.0 * 782.0)
    // same-line neighbors: ab at gap 6, ef at gap 6; second slots padded
    assert(v("l_dist0") == 6.0 && v("l_dist1") == FeatureFrame.PadDistance)
    assert(v("r_dist0") == 6.0 && v("r_dist1") == FeatureFrame.PadDistance)
    assert(v("l0_feat_len") == 2.0 && v("l1_feat_len") == 0.0)
    assert(v("r0_feat_len") == 2.0)
    // single page, first word = "ab" box
    assert(v("relative_position_in_page") == 0.0)
    assert(v("first_word_x0") == 0.0 && v("first_word_y0") == 782.0)
    assert(v("first_word_x1") == 12.0 && v("first_word_y1") == 792.0)
  }

  test("second-line target uses its own line's neighbors and geometry") {
    val names = FeatureFrame.featureNames(2, 2)
    val rows = FeatureFrame.assembleDoc(text, chars, tokens, tokens)
    val z = rows(4)
    assert(z.offsetString == "z")
    def v(n: String) = z.features(idx(n, names))
    // line 2: col 3 -> x0=18; y drops one 12-unit line
    assert(v("x0") == 18.0 && v("y1") == 780.0 && v("y0") == 770.0)
    assert(v("l_dist0") == 6.0 && v("r_dist0") == 6.0) // xy and 12,3
    assert(v("l0_feat_len") == 2.0) // "xy"
    assert(v("r0_feat_num_count") == 12.3) // "12,3" normalizes
    // the number token carries its normalized value in its own row
    def vn(n: String) = rows(5).features(idx(n, names))
    assert(vn("feat_num_count") == 12.3 && vn("feat_substring_count_comma") == 1.0)
  }

  test("cross-line variant probes adjacent lines with pos offsets") {
    val names = FeatureFrame.featureNames(3, 3, acrossLines = true)
    val rows = FeatureFrame.assembleDoc(text, chars, tokens, tokens,
      nLeft = 3, nRight = 3, acrossLines = true)
    val z = rows(4)
    def v(n: String) = z.features(idx(n, names))
    // same-line left = xy (pos 0); the rest come from line 1, reversed
    assert(v("l_dist0") == 6.0 && v("l_pos0") == 0.0)
    assert(v("l_pos1") == -1.0 && v("l_pos2") == -1.0)
    assert(v("l1_feat_len") == 2.0) // "ef" (line-1 candidates reversed)
  }

  test("optional word-on-page and catchphrase blocks follow the reference order") {
    val subs = Seq("cd", "zz")
    val phrases = Seq("ab", "nope")
    val names = FeatureFrame.featureNames(2, 2,
      substringFeatures = subs, catchphrases = phrases)
    assert(names.length == 270 + 2 + 2)
    // word_on_page sits between relative_position and the first-word box;
    // catchphrases are last (information_extraction.py:1608-1637)
    assert(names.indexOf("word_on_page_feat0") == names.indexOf("relative_position_in_page") + 1)
    assert(names.indexOf("first_word_x0") == names.indexOf("word_on_page_feat1") + 1)
    assert(names.last == "catchphrase_dist_nope")

    val rows = FeatureFrame.assembleDoc(text, chars, tokens, tokens,
      substringFeatures = subs, catchphrases = phrases)
    val z = rows(4) // "z" on line 2
    def v(n: String) = z.features(idx(n, names))
    assert(v("word_on_page_feat0") == 1.0) // "cd" occurs on page 0
    assert(v("word_on_page_feat1") == 0.0) // "zz" does not
    assert(v("catchphrase_dist_ab") == 1.0) // "ab" one line back
    assert(v("catchphrase_dist_nope") == -1.0) // never seen
    val cd = rows(1) // on the first line: no previous line contains anything
    assert(cd.features(idx("catchphrase_dist_ab", names)) == -1.0)
  }

  test("frame over extraction output is deterministic across partitionings") {
    import spark.implicits._
    val a = FeatureFrame.forDocs(Extraction.extract(Extraction.syntheticPages(spark, 40, 2))).collect()
    val b = FeatureFrame.forDocs(Extraction.extract(Extraction.syntheticPages(spark, 40, 7))).collect()
    def key(r: FeatureFrame.SpanFrameRow) = (r.url, r.start, r.end)
    val am = a.map(r => key(r) -> r.features.toSeq).toMap
    val bm = b.map(r => key(r) -> r.features.toSeq).toMap
    assert(am == bm)
    assert(a.nonEmpty && a.forall(_.features.length == 270))
  }

  test("a target on a line with no candidates gets Pad neighbors, not a crash") {
    // targets are not required to be a subset of candidates: probe a span on
    // line 1 while candidates exist only on line 0 — the same-line search
    // must fall through to empty (Pad) neighbors
    val line0Only = tokens.take(3) // ab cd ef (line 0)
    val probe = IndexedSeq(Span(9, 11)) // xy (line 1)
    val rows = FeatureFrame.assembleDoc(text, chars, line0Only, probe)
    assert(rows.length == 1)
    val names = FeatureFrame.featureNames(2, 2)
    def v(n: String) = rows(0).features(idx(n, names))
    assert(v("l_dist0") == FeatureFrame.PadDistance && v("r_dist0") == FeatureFrame.PadDistance)
  }

  test("a null-box candidate between boxed ones does not fake monotonicity") {
    // candidate offsets out of order relative to a null-box member would
    // break the binary search's assumptions: the precheck must see ALL
    // candidates' offsets, so this line takes the exact full-scan path and
    // the neighbor set matches the all-boxed reference ordering
    val text2 = "ab cd ef"
    val chars2 = Geometry.syntheticCharBoxes(text2)
    val toks = IndexedSeq(Span(0, 2), Span(3, 5), Span(6, 8))
    val full = FeatureFrame.assembleDoc(text2, chars2, toks, toks)
    // same candidates presented in a non-monotone offset order
    val shuffled = IndexedSeq(Span(3, 5), Span(0, 2), Span(6, 8))
    val out = FeatureFrame.assembleDoc(text2, chars2, shuffled, toks)
    val names = FeatureFrame.featureNames(2, 2)
    def vf(rs: Vector[FeatureFrame.Row], i: Int, n: String) = rs(i).features(idx(n, names))
    // target "cd": left neighbor ab (gap 6), right neighbor ef (gap 6) in both
    assert(vf(out, 1, "l_dist0") == vf(full, 1, "l_dist0"))
    assert(vf(out, 1, "r_dist0") == vf(full, 1, "r_dist0"))
  }
}
