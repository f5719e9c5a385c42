package graft.tools

import graft.engine.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level wall breakdown of the near-dedup pipeline over a real
  * documents table — separates page/corpus materialization, MinHash
  * signatures, LSH candidate generation, exact-Jaccard verification, and
  * connected-component resolution, so a scale regression names its stage
  * instead of hiding inside one composed number.
  *
  *   runMain graft.tools.NearDedupProfile <sfDir> [maxBucket] [threshold]
  */
object NearDedupProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxBucket = if (args.length > 1) args(1).toInt else 48
    val threshold = if (args.length > 2) args(2).toDouble else 0.85
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[neardedup] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val corpus = timed("materialize corpus")(docs.localCheckpoint(true))
    val ds = corpus.as[(Long, String)]
    val sigs = timed("signatures (minhash64)") {
      val s = Dedup.signatures(ds).persist(); s.count(); s
    }
    val cands = timed(s"candidatePairs (cap=$maxBucket)") {
      val c = Dedup.candidatePairs(sigs, maxBucket).localCheckpoint(true)
      println(s"[neardedup]   candidate pairs: ${c.count()}")
      c
    }
    val near = timed("exactJaccard verify") {
      val n = Dedup.exactJaccard(ds, cands)
        .filter(_.estimated_jaccard >= threshold)
        .map(p => Dedup.Pair(p.a, p.b))
        .localCheckpoint(true)
      println(s"[neardedup]   verified pairs >= $threshold: ${n.count()}")
      n
    }
    val res = timed("resolveClusters (CC)")(Dedup.resolveClustersDetailed(near))
    println(s"[neardedup]   components rounds=${res.iterations} members=${res.assignment.count()}")
    val kept = timed("anti-join non-keepers") {
      corpus.join(res.assignment.filter(col("id") =!= col("keeper_id"))
        .select(col("id").as("doc_id")), Seq("doc_id"), "left_anti").count()
    }
    println(s"[neardedup] kept $kept of ${corpus.count()} docs")
    sigs.unpersist()
    // optional: measure capped-star leakage recovery by the multi-pass
    // operator (pass 2 re-buckets the survivors, usually under the cap)
    if (sys.env.get("SPARK_GRAFT_NEARDEDUP_PASSES").exists(_.toInt > 1)) {
      val passes = sys.env("SPARK_GRAFT_NEARDEDUP_PASSES").toInt
      val k2 = timed(s"dedupNearText passes=$passes")(
        Dedup.dedupNearText(corpus, "doc_id", "text", maxBucket = maxBucket,
          threshold = threshold, passes = passes).count())
      println(s"[neardedup] multi-pass kept $k2 (single-pass kept $kept)")
    }
    spark.stop()
  }
}
