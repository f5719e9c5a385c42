package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox sleeps all day long today"),
    (2L, "slow green turtle walks under the busy bridge"),
    (3L, "the quick brown fox jumps over the lazy dog again and again"),
    (4L, "completely unrelated words about cooking pasta tonight")
  ).toDF("doc_id", "text")

  test("buildIndex: postings carry tf and dl; scalars count every doc") {
    val idx = Retrieval.buildIndex(corpus, "doc_id", "text")
    assert(idx.nDocs == 5)
    // doc 0 has 9 tokens -> 8 bigrams, all distinct -> tf 1, dl 8
    val d0 = idx.postings.filter($"id" === 0L).collect()
    assert(d0.length == 8 && d0.forall(r => r.getAs[Long]("tf") == 1L && r.getAs[Int]("dl") == 8))
    // "the lazy" occurs in docs 0 and 3 -> df 2
    val df = idx.termStats.filter($"term" === "the lazy").head.getAs[Long]("df")
    assert(df == 2L)
    // total = sum of (tokens-1) per doc
    assert(idx.totalTerms == corpus.select(sum(size(
      Retrieval.alnumTokens($"text")) - 1)).head.getLong(0))
  }

  test("search: integer overlap selects the set; source doc matches all its own terms") {
    val idx = Retrieval.buildIndex(corpus, "doc_id", "text")
    val queries = Seq((0L, "the quick brown fox jumps")).toDF("query_id", "qtext")
    val hits = Retrieval.search(idx, queries, minMatchNum = 3, minMatchDen = 5)
      .orderBy("id").collect()
    // 4 query bigrams; docs 0 and 3 match all 4; doc 1 matches 3 (>= 3/5 of 4
    // cross-multiplied: 3*5 >= 4*3); docs 2 and 4 match none
    assert(hits.map(_.getAs[Long]("id")).toSeq == Seq(0L, 1L, 3L))
    val byId = hits.map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_matched")).toMap
    assert(byId(0L) == 4L && byId(3L) == 4L && byId(1L) == 3L)
    assert(hits.forall(_.getAs[Long]("qn") == 4L))
  }

  test("topK: shorter doc with same matches ranks first (BM25 length normalization)") {
    val idx = Retrieval.buildIndex(corpus, "doc_id", "text")
    val queries = Seq((0L, "the quick brown fox jumps over the lazy dog")).toDF("query_id", "qtext")
    val ranked = Retrieval.topK(
      Retrieval.search(idx, queries, 3, 5), k = 2).orderBy("rank").collect()
    // doc 0 IS the query (8/8 terms, dl 8); doc 3 matches 8/8 too but is
    // longer (dl 12) -> length normalization puts doc 0 first
    assert(ranked.map(_.getAs[Long]("id")).toSeq == Seq(0L, 3L))
    assert(ranked.head.getAs[Double]("score") > ranked(1).getAs[Double]("score"))
  }

  test("bigramTerms: below 2 tokens yields empty; punctuation splits fold case") {
    val got = Seq(("A!!b c", 0), ("one", 1), ("", 2)).toDF("t", "k")
      .select($"k", Retrieval.bigramTerms(Retrieval.alnumTokens($"t")).as("b"))
      .orderBy("k").as[(Int, Seq[String])].collect()
    assert(got(0)._2 == Seq("a b", "b c"))
    assert(got(1)._2.isEmpty && got(2)._2.isEmpty)
  }
}
