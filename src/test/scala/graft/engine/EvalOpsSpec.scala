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
