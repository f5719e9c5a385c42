package graft.engine

import graft.core.{Geometry, Span}
import org.scalatest.funsuite.AnyFunSuite

/** Focused M1-M4 semantics (information_extraction.py:196-473). */
class MergeSpec extends AnyFunSuite {

  private def scored(s: Int, e: Int, label: String, conf: Double = 0.9) =
    Scorer.Scored(Span(s, e), label, conf, "")

  test("M1/M2: Text-type runs merge across small space gaps") {
    val text = "alpha beta  gamma"
    val rows = Seq(scored(0, 5, "url"), scored(6, 10, "url"), scored(12, 17, "url"))
    val merged = Merge.mergeHorizontal(text, rows)
    assert(merged.length == 1)
    assert(merged.head.span == Span(0, 17))
    assert(math.abs(merged.head.confidence - 0.9) < 1e-12)
  }

  test("M2: gap > 5 chars or non-space gap blocks the merge") {
    val farText = "aa        bb"
    val far = Merge.mergeHorizontal(farText, Seq(scored(0, 2, "url"), scored(10, 12, "url")))
    assert(far.length == 2) // 8-space gap > 5
    val dirtyText = "aa x bb"
    val dirty = Merge.mergeHorizontal(dirtyText, Seq(scored(0, 2, "url"), scored(5, 7, "url")))
    assert(dirty.length == 2) // non-space char in gap
  }

  test("M2: newline in merged range blocks the merge") {
    val text = "aa\nbb"
    val rows = Seq(scored(0, 2, "url"), scored(3, 5, "url"))
    assert(Merge.mergeHorizontal(text, rows).length == 2)
  }

  test("M2: Number never merges; Date merges only when still a date") {
    val nums = "12 34"
    assert(Merge.mergeHorizontal(nums, Seq(scored(0, 2, "number"), scored(3, 5, "number"))).length == 2)
    // "03.12. 2019" → merged "03.12. 2019" normalizes to a date → merges
    val dateText = "03.12. 2019"
    val dm = Merge.mergeHorizontal(dateText, Seq(scored(0, 6, "date"), scored(7, 11, "date")))
    assert(dm.length == 1)
    assert(dm.head.normalized == "2019-12-03")
    // "01.02.2019 03.04.2020" merged is NOT a date → two rows stay
    val two = "01.02.2019 03.04.2020"
    assert(Merge.mergeHorizontal(two, Seq(scored(0, 10, "date"), scored(11, 21, "date"))).length == 2)
  }

  test("M3: merged confidence is the buffer mean and text the raw slice") {
    val text = "aa bb"
    val m = Merge.mergeHorizontal(text, Seq(scored(0, 2, "url", 0.8), scored(3, 5, "url", 0.6)))
    assert(m.length == 1)
    assert(math.abs(m.head.confidence - 0.7) < 1e-12)
  }

  test("M4: vertical merge joins x-overlapping lines, blocks foreign chars") {
    // two-line doc on the synthetic grid: "total\nvalue" columns align
    val text = "total\nvalue"
    val chars = Geometry.syntheticCharBoxes(text)
    val rows = Seq(scored(0, 5, "amount"), scored(6, 11, "amount"))
    val merged = Merge.mergeVertical(text, chars, rows)
    assert(merged.length == 1)
    assert(merged.head._2.length == 2) // two line spans preserved
    assert(merged.head._1.normalized == "total\nvalue")

    // a foreign line between two x-aligned targets blocks the merge: the
    // union box of line1+line3 contains line2's characters
    val text2 = "xx\nzz\nxx"
    val chars2 = Geometry.syntheticCharBoxes(text2)
    val rows2 = Seq(scored(0, 2, "amount"), scored(6, 8, "amount"))
    val merged2 = Merge.mergeVertical(text2, chars2, rows2)
    assert(merged2.length == 2)
    assert(merged2.forall(_._2.length == 1))
  }
}
