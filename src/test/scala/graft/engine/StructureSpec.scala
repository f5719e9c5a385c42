package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-side structured extraction (q85/q86/q93): DataFrame plumbing and
  * the outline stack semantics.
  */
class StructureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def pages(html: String*) = {
    import spark.implicits._
    html.zipWithIndex.map { case (h, i) =>
      (i.toLong, h.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }.toDF("doc_id", "html")
  }

  test("outline: push, deepen, pop to sibling, and level-skip") {
    import spark.implicits._
    val df = pages(
      "<h1>A</h1><h3>B</h3><h2>C</h2><h2>D</h2><h1>E</h1>")
    val out = Structure.outline(df, "doc_id", "html")
      .orderBy("seq")
      .select("seq", "level", "heading", "path")
      .as[(Int, Int, String, String)].collect()
    assert(out.toSeq == Seq(
      (0, 1, "A", "A"),
      (1, 3, "B", "A > B"), // level skip: h3 nests under h1
      (2, 2, "C", "A > C"), // pops the h3
      (3, 2, "D", "A > D"), // pops the sibling h2
      (4, 1, "E", "E"))) // pops everything
  }

  test("outline: no headings, no rows; null html, no rows") {
    import spark.implicits._
    val df = pages("<p>plain</p>")
      .unionByName(Seq((9L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "html"))
    assert(Structure.outline(df, "doc_id", "html").count() == 0)
  }

  test("outline: headings inside head/script do not surface") {
    val df = pages("<head><title>t</title></head><script>'<h1>no</h1>'</script><h1>yes</h1>")
    import spark.implicits._
    val out = Structure.outline(df, "doc_id", "html")
      .select("heading").as[String].collect()
    assert(out.toSeq == Seq("yes"))
  }

  test("tableCells/pageMeta: null html yields no cells / empty meta") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "html")
    assert(Structure.tableCells(df, "doc_id", "html").count() == 0)
    val m = Structure.pageMeta(df, "doc_id", "html")
      .select("title", "noindex").as[(String, Boolean)].head()
    assert(m == (("", false)))
  }

  test("tableCells plan: one narrow kernel, no exchange before the caller's") {
    val df = pages("<table><tr><td>x</td></tr></table>")
    val plan = Structure.tableCells(df, "doc_id", "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
