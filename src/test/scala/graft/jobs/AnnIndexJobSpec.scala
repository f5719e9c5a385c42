package graft.jobs

import graft.engine.{Similarity, SparkTestBase}
import org.scalatest.funsuite.AnyFunSuite

/** IVF index job: persistent build, centroid round-trip, and the contract
  * that a prebuilt-index query equals the inline-fit query (the fit is out
  * of the query path but must not change results).
  */
class AnnIndexJobSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def corpus = {
    import spark.implicits._
    (0L until 300L).map { i =>
      val c = (i % 5).toInt
      (i, Array.tabulate(12)(d => (math.cos(c * 17 + d) + 0.02 * math.sin(i * 3 + d)).toFloat))
    }.toDS()
  }

  test("local k-means is deterministic and returns k centers") {
    import spark.implicits._
    val sample = corpus.collect().sortBy(_._1).map(_._2)
    val a = Similarity.localKMeans(sample, 5)
    val b = Similarity.localKMeans(sample, 5)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.length == 5)
  }

  test("build persists centroids and cell-partitioned corpus; load round-trips") {
    val out = java.nio.file.Files.createTempDirectory("graft_ann_index").toString
    val built = AnnIndexJob.build(spark, corpus, out, nCells = 5)
    val loaded = AnnIndexJob.loadCentroids(spark, out)
    assert(built.centroids.map(_.toSeq).toSeq == loaded.centroids.map(_.toSeq).toSeq)
    // cell partitioning covers the whole corpus exactly once
    val cells = spark.read.parquet(s"$out/cells")
    assert(cells.count() == 300)
    assert(cells.select("cell").distinct().count() <= 5)
  }

  test("prebuilt-index query equals the inline-fit query") {
    import spark.implicits._
    val queries = corpus.filter(_._1 < 5).collect().sortBy(_._1)
    val index = Similarity.buildIvfIndexLocal(corpus, nCells = 5)
    val a = Similarity.ivfTopK(corpus, queries, 4, index, nProbe = 2).collect()
      .map(n => (n.query_id, n.rank, n.neighbor_id)).sorted.toSeq
    val b = Similarity.ivfTopK(corpus, queries, 4, nCells = 5, nProbe = 2).collect()
      .map(n => (n.query_id, n.rank, n.neighbor_id)).sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
