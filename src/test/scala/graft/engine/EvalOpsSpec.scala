package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class EvalOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("E7: tokenizer evaluation recall per doc") {
    import spark.implicits._
    val gt = Seq((1L, 0, 4), (1L, 5, 9), (2L, 0, 3)).toDF("doc_id", "start_offset", "end_offset")
    val tokens = Seq((1L, 0, 4), (1L, 10, 12), (2L, 0, 3)).toDF("doc_id", "start_offset", "end_offset")
    val got = Evaluate.tokenizerEvaluate(tokens, gt)
      .select("doc_id", "n_gt", "n_found").as[(Long, Long, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("C4: NO_LABEL cap keeps labeled rows and first-k negatives") {
    import spark.implicits._
    val df = Seq(
      (1L, 0, "NO_LABEL"), (1L, 10, "NO_LABEL"), (1L, 20, "NO_LABEL"),
      (1L, 30, "amount"), (1L, 40, "NO_LABEL"),
    ).toDF("doc_id", "start_offset", "label")
    val capped = Evaluate.capNoLabel(df, "label", "NO_LABEL", 2)
      .select("start_offset").as[Int].collect().sorted
    assert(capped.toSeq == Seq(0, 10, 30)) // 2 negatives + the labeled row
  }

  test("C4: cap holds when labeled rows PRECEDE the negatives") {
    import spark.implicits._
    val df = Seq(
      (1L, 0, "amount"), (1L, 10, "date"), (1L, 20, "NO_LABEL"),
      (1L, 30, "NO_LABEL"), (1L, 40, "NO_LABEL"),
    ).toDF("doc_id", "start_offset", "label")
    val capped = Evaluate.capNoLabel(df, "label", "NO_LABEL", 2)
      .select("start_offset").as[Int].collect().sorted
    assert(capped.toSeq == Seq(0, 10, 20, 30)) // both labeled + first 2 negatives
  }

  test("E7: duplicate tokens do not fan out gt rows or inflate recall") {
    import spark.implicits._
    val gt = Seq((1L, 0, 5), (1L, 10, 15)).toDF("doc_id", "start_offset", "end_offset")
    val tokens = Seq((1L, 0, 5), (1L, 0, 5)).toDF("doc_id", "start_offset", "end_offset")
    val got = Evaluate.tokenizerEvaluate(tokens, gt)
      .select("n_gt", "n_found").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((2L, 1L)), "recall must be 0.5, not 0.667")
  }

  test("C4: null labels count as NO_LABEL for the cap") {
    import spark.implicits._
    val df = Seq(
      (1L, 0, null), (1L, 10, null), (1L, 20, null),
      (1L, 30, "amount"), (1L, 40, null),
    ).toDF("doc_id", "start_offset", "label")
    val capped = Evaluate.capNoLabel(df, "label", "NO_LABEL", 2)
      .select("start_offset").as[Int].collect().sorted
    assert(capped.toSeq == Seq(0, 10, 30), "null-labeled negatives must be capped too")
  }

  test("E5: calc on an empty flags frame is all-zero, not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long, Long, Long, Long, Long, Double, Double, Boolean)]
      .toDF("doc_id", "ann_id", "annotation_set_id", "label_id", "label_set_id",
        "start_offset", "end_offset", "confidence", "label_threshold", "is_correct")
    val flags = Evaluate.compareStrict(empty, empty)
    val c = Evaluate.calc(flags)
    assert(c.tp == 0 && c.fp == 0 && c.fn == 0)
  }

  test("T12: missing_spans returns correct gt spans the tokenizer did not produce") {
    import spark.implicits._
    val gt = Seq(
      (1L, 0, 5, true), // found
      (1L, 10, 15, true), // missing
      (1L, 20, 25, false), // incorrect gt -> never reported
      (2L, 0, 5, true), // missing (other doc)
    ).toDF("doc_id", "start_offset", "end_offset", "is_correct")
    val tokens = Seq((1L, 0, 5), (1L, 30, 35)).toDF("doc_id", "start_offset", "end_offset")
    val missing = Evaluate.missingSpans(gt, tokens)
      .select("doc_id", "start_offset").as[(Long, Int)].collect().sorted
    assert(missing.toSeq == Seq((1L, 10), (2L, 0)))
  }
}
