package graft.tools

import graft.engine.Retrieval
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the q81 path at a given SF — which of tokenize /
  * index-build / query-prep / search dominates.
  */
object Bm25Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // stage 0: raw tokenize count
    time("tokenize-count")(
      docs.select(explode(Retrieval.alnumTokens(col("text"))).as("t")).count())
    // stage 0b: bigram explode count
    time("bigram-count")(
      docs.select(explode(Retrieval.bigramTerms(Retrieval.alnumTokens(col("text")))).as("t")).count())
    val idx = time("buildIndex")(Retrieval.buildIndex(docs, "doc_id", "text"))
    println(s"[prof] postings=${idx.postings.count()} terms=${idx.termStats.count()} nDocs=${idx.nDocs}")
    val queries = docs.filter(col("doc_id") % 61 === 0 && col("doc_id") < 488)
      .select((col("doc_id") / 61).cast("long").as("query_id"),
        concat_ws(" ", slice(Retrieval.alnumTokens(col("text")), 1, 12)).as("qtext"))
    val qt = time("queryTerms-collect")(Retrieval.queryTerms(queries).collect())
    println(s"[prof] qt rows=${qt.length}")
    time("search")(Retrieval.search(idx, queries, 1, 5).count())
    time("search-again")(Retrieval.search(idx, queries, 1, 5).count())
    spark.stop()
  }
}
