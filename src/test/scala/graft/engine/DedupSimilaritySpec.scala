package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def corpusWithDups = {
    import spark.implicits._
    val base = Seq(
      1L -> "the quick brown fox jumps over the lazy dog near the river bank today",
      2L -> "the quick brown fox jumps over the lazy dog near the river bank tonight",
      3L -> "completely different content about spark catalyst optimizer rules and shuffles",
      4L -> "the quick brown fox jumps over the lazy dog near the river bank today", // exact dup of 1
      5L -> "another unrelated piece of text mentioning window functions and broadcast joins",
    )
    base.toDF("id", "text")
  }

  test("exact dedup keeps smallest id per hash") {
    import spark.implicits._
    val kept = Dedup.dedupExact(corpusWithDups, "id", "text")
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("minhash LSH finds exact and near duplicates") {
    import spark.implicits._
    val ds = corpusWithDups.as[(Long, String)]
    val pairs = Dedup.minhashNearDups(ds, 0.7).collect().map(p => (p.a, p.b)).toSet
    assert(pairs.contains((1L, 4L))) // exact dup
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash near-dups via hamming blocking") {
    import spark.implicits._
    val pairs = Dedup.simhashNearDups(corpusWithDups.as[(Long, String)], maxDist = 3)
      .collect().map(p => (p.a, p.b)).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("exact jaccard verification") {
    import spark.implicits._
    val ds = corpusWithDups.as[(Long, String)]
    val pairs = Seq(Dedup.Pair(1L, 4L), Dedup.Pair(1L, 3L)).toDS()
    val scored = Dedup.exactJaccard(ds, pairs).collect().map(p => (p.a, p.b) -> p.estimated_jaccard).toMap
    assert(scored((1L, 4L)) == 1.0)
    assert(scored((1L, 3L)) == 0.0)
  }

  test("brute-force ANN: self is rank-1, results deterministic") {
    import spark.implicits._
    val vecs = (0L until 50L).map { i =>
      val v = Array.tabulate(8)(d => math.sin(i * 31 + d * 7).toFloat)
      (i, v)
    }
    val corpus = vecs.toDS()
    val queries = vecs.take(3).toArray
    val res = Similarity.bruteForceTopK(corpus, queries, 4).collect()
    queries.foreach { case (qid, _) =>
      val top = res.filter(_.query_id == qid).minBy(_.rank)
      assert(top.neighbor_id == qid && math.abs(top.cosine - 1.0) < 1e-9)
    }
    val res2 = Similarity.bruteForceTopK(corpus.repartition(7), queries, 4).collect()
    assert(res.map(n => (n.query_id, n.rank, n.neighbor_id)).sorted.toSeq ==
      res2.map(n => (n.query_id, n.rank, n.neighbor_id)).sorted.toSeq)
  }

  test("LSH ANN recall against brute force on clustered vectors") {
    import spark.implicits._
    // clustered data: LSH same-bucket probing should recover most true top-3
    val vecs = (0L until 200L).map { i =>
      val c = (i % 4).toInt
      val v = Array.tabulate(8)(d => (math.cos(c * 13 + d) + 0.01 * math.sin(i * 7 + d)).toFloat)
      (i, v)
    }
    val corpus = vecs.toDS()
    val queries = vecs.take(5).toArray
    val bf = Similarity.bruteForceTopK(corpus, queries, 3).collect()
      .map(n => (n.query_id, n.neighbor_id)).toSet
    val lsh = Similarity.lshTopK(corpus, queries, 3).collect()
      .map(n => (n.query_id, n.neighbor_id)).toSet
    val recall = bf.intersect(lsh).size.toDouble / bf.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("IVF ANN recall against brute force on clustered vectors") {
    import spark.implicits._
    val vecs = (0L until 200L).map { i =>
      val c = (i % 4).toInt
      val v = Array.tabulate(8)(d => (math.cos(c * 13 + d) + 0.01 * math.sin(i * 7 + d)).toFloat)
      (i, v)
    }
    val corpus = vecs.toDS()
    val queries = vecs.take(5).toArray
    val bf = Similarity.bruteForceTopK(corpus, queries, 3).collect()
      .map(n => (n.query_id, n.neighbor_id)).toSet
    val ivf = Similarity.ivfTopK(corpus, queries, 3, nCells = 8, nProbe = 2).collect()
      .map(n => (n.query_id, n.neighbor_id)).toSet
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    assert(recall >= 0.8, s"IVF recall $recall")
  }

  test("multimodal stub decode is deterministic with real schema") {
    val a = Multimodal.decodeFeatures(Multimodal.syntheticMedia(spark, 50, 2)).collect()
    val b = Multimodal.decodeFeatures(Multimodal.syntheticMedia(spark, 50, 8)).collect()
    assert(a.map(_.sha256).sorted.toSeq == b.map(_.sha256).sorted.toSeq)
    assert(a.forall(_.embedding.length == Multimodal.StubCodec.EmbeddingDim))
    assert(a.filter(_.media_type == "video").forall(_.frames_sampled >= 1))
  }
}
