package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Intra-document repeated-line removal (Dedup.dedupLinesWithinDoc):
  * first-occurrence keeping, order preservation, idempotence, edge cases,
  * and the zero-shuffle plan contract.
  */
class DedupLocalLinesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def run(texts: Seq[String]): Seq[String] = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    Dedup.dedupLinesWithinDoc(df, "text")
      .orderBy("id").select("text").as[String].collect().toSeq
  }

  test("keeps only the first occurrence of each line, preserving order") {
    assert(run(Seq("a\nb\na\nc\nb\na")) == Seq("a\nb\nc"))
    assert(run(Seq("nav\nbody one\nnav\nbody two\nnav")) ==
      Seq("nav\nbody one\nbody two"))
  }

  test("no duplicates → unchanged; single line; empty text") {
    assert(run(Seq("x\ny\nz")) == Seq("x\ny\nz"))
    assert(run(Seq("only")) == Seq("only"))
    assert(run(Seq("")) == Seq(""))
  }

  test("empty lines deduplicate like any other line") {
    // "a", "", "b", "", "a" → keep a, "", b
    assert(run(Seq("a\n\nb\n\na")) == Seq("a\n\nb"))
  }

  test("idempotent") {
    import spark.implicits._
    val df = Seq((0L, "h\nx\nh\ny\nx")).toDF("id", "text")
    val once = Dedup.dedupLinesWithinDoc(df, "text")
    val twice = Dedup.dedupLinesWithinDoc(once, "text")
    assert(twice.select("text").as[String].head() ==
      once.select("text").as[String].head())
  }

  test("other columns pass through; plan has no exchange (pure narrow)") {
    import spark.implicits._
    val df = Seq((7L, "a\na", "keepme")).toDF("id", "text", "tag")
    val out = Dedup.dedupLinesWithinDoc(df, "text")
    assert(out.columns.toSeq == Seq("id", "text", "tag"))
    assert(out.select("tag").as[String].head() == "keepme")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
