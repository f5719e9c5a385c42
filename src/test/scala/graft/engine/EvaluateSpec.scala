package graft.engine

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Scenario tests for the compare/flag algebra, mirroring the reference's
  * evaluate scenarios (tests/test_evaluate.py docstring matrix): perfect
  * match, missing prediction, spurious prediction, wrong label,
  * below-threshold confidence.
  */
class EvaluateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def df(rows: Seq[(Long, Long, Long, Long, Long, Int, Int, Boolean, Double, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "ann_id", "annotation_set_id", "label_id", "label_set_id",
      "start_offset", "end_offset", "is_correct", "confidence", "label_threshold")
  }

  private val gt = df(Seq(
    (1L, 10L, 1L, 100L, 1L, 0, 4, true, 1.0, 0.1),
    (1L, 11L, 1L, 101L, 1L, 5, 9, true, 1.0, 0.1),
    (1L, 12L, 1L, 102L, 1L, 10, 14, true, 1.0, 0.1),
    (1L, 13L, 1L, 103L, 1L, 20, 24, true, 1.0, 0.1),
  ))

  test("perfect prediction: all TP") {
    val flags = Evaluate.compareStrict(gt, gt)
    val c = Evaluate.calc(flags)
    assert(c.tp == 4 && c.fp == 0 && c.fn == 0)
    assert(c.f1.contains(1.0))
  }

  test("missing + wrong-label + below-threshold predictions") {
    val pred = df(Seq(
      (1L, 10L, 1L, 100L, 1L, 0, 4, false, 0.9, 0.1), // exact match → TP
      (1L, 11L, 1L, 999L, 1L, 5, 9, false, 0.9, 0.1), // wrong label → FP (+FN? no: matched & above)
      (1L, 12L, 1L, 102L, 1L, 10, 14, false, 0.05, 0.1), // below threshold → FN
      // ann 13 missing entirely → FN
      (1L, 14L, 1L, 104L, 1L, 30, 34, false, 0.9, 0.1), // spurious span, no gt → FP
    ))
    val c = Evaluate.calc(Evaluate.compareStrict(gt, pred))
    assert(c.tp == 1, s"tp=${c.tp}")
    assert(c.fn == 2, s"fn=${c.fn}")
    assert(c.fp >= 2, s"fp=${c.fp}") // wrong label + spurious
  }

  test("non-strict overlap matches shifted spans") {
    val pred = df(Seq(
      (1L, 10L, 1L, 100L, 1L, 1, 6, false, 0.9, 0.1), // overlaps gt (0,4) same label
    ))
    val flags = Evaluate.compareNonStrict(
      gt.filter(org.apache.spark.sql.functions.col("ann_id") === 10L), pred)
    val c = Evaluate.calc(flags)
    assert(c.tp == 1)
  }

  test("EvaluationCalculator zero-division contract") {
    val c = Evaluate.Calc(0, 0, 0, 5)
    assert(c.precision.isEmpty && c.recall.isEmpty && c.f1.isEmpty)
    val c2 = Evaluate.Calc(3, 1, 2, 0)
    assert(c2.precision.contains(0.75))
    assert(c2.recall.contains(0.6))
    assert(math.abs(c2.f1.get - 3.0 / (3 + 0.5 * 3)) < 1e-12)
  }

  test("weighted mode picks max weight with smallest-value tie-break") {
    import spark.implicits._
    val wm = org.apache.spark.sql.functions.udaf(new Evaluate.WeightedMode())
    val d = Seq((1L, 5L, 1.0), (1L, 5L, 1.0), (1L, 7L, 1.5), (2L, 3L, 1.0), (2L, 9L, 1.0))
      .toDF("g", "v", "w")
    val got = d.groupBy("g").agg(wm($"v", $"w").as("m")).orderBy("g").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 5L), (2L, 3L))) // g=1: 5 has weight 2.0 > 1.5; g=2 tie → smallest
  }
}
