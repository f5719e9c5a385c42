package graft.tools

import graft.engine.{Blocklist, Dedup, LangModel, Pack, Sampling}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level wall breakdown of the q69 curation pipeline over a real
  * documents table — separates the blocklist gate, page wrap + in-page
  * dedup, LM fit, LM scoring, stratified sampling, domain caps, and
  * sequence packing, so a scale regression names its stage instead of
  * hiding inside one composed number. Mirrors the q69 construction (same
  * url lattice, banner wrap, thresholds scale-free by design).
  *
  *   runMain graft.tools.CurationProfile <sfDir>
  */
object CurationProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      println(f"[curation] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val t00 = System.nanoTime()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("lang"))
      .withColumn("url", concat(lit("https://"),
        when(col("doc_id") % 23 === 5, lit("Shop.Site5.CO.UK"))
          .otherwise(concat(lit("sub"), col("doc_id") % 5,
            lit(".site"), col("doc_id") % 23, lit(".com"))),
        lit("/page/"), col("doc_id")))
    val blocked = Seq("site3.com", "site7.com", "site11.com", "site5.co.uk")
      .toDF("domain")
    val gated = timed("blocklist gate") {
      val g = Blocklist.filterDocs(docs, "url", "text", blocked,
          Map("casino" -> 5, "viagra" -> 10, "buy" -> 1), maxBadPerMille = 8L)
        .where(col("keep") === 1)
        .select(col("doc_id"), col("text"), col("lang"), col("reg_domain"))
        .localCheckpoint(true)
      println(s"[curation]   gated docs: ${g.count()}")
      g
    }
    val deduped = timed("wrap + in-page line dedup") {
      val wrapped = gated.as[(Long, String, String, String)]
        .map { case (i, text, lang, dom) =>
          val groups = text.split(" ", -1).grouped(6).map(_.mkString(" ")).toArray
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < groups.length) {
            buf += groups(j)
            if (j % 4 == 3) buf += "ad banner buy now"
            j += 1
          }
          if (i % 3 == 0 && groups.nonEmpty) buf += groups(0)
          (i, buf.mkString("\n"), lang, dom)
        }
        .toDF("doc_id", "text", "lang", "reg_domain")
      Dedup.dedupLinesWithinDoc(wrapped, "text")
        .withColumn("flat", regexp_replace(col("text"), "\n", " "))
        .localCheckpoint(true)
    }
    val lm = timed("LM fit (unigram)") {
      val m = LangModel.fitUnigram(deduped, "flat").localCheckpoint(true)
      println(s"[curation]   vocab: ${m.count()}")
      m
    }
    val scored = timed("LM score + bucket") {
      val s = LangModel.scoreDocs(deduped, lm, "doc_id", "flat",
          tauHead = 1.065, tauTail = 1.049, carry = Seq("lang", "reg_domain"))
        .where(col("bucket") =!= "tail")
        .localCheckpoint(true)
      println(s"[curation]   head+middle docs: ${s.count()}")
      s
    }
    val sampled = timed("stratified sample") {
      val x = Sampling.stratifiedSample(scored, "doc_id", "lang",
        Map("en" -> 1.0, "de" -> 0.5, "es" -> 0.25, "zh" -> 0.125),
        defaultRate = 0.0625, salt = "cur1").localCheckpoint(true)
      println(s"[curation]   sampled docs: ${x.count()}")
      x
    }
    val capped = timed("per-domain cap") {
      val c = Sampling.capPerGroup(sampled, "reg_domain", "doc_id", 20)
        .select(col("doc_id"), col("lang"), col("reg_domain"), col("bucket"),
          col("n_tokens"))
        .localCheckpoint(true)
      println(s"[curation]   capped docs: ${c.count()}")
      c
    }
    timed("sequence packing") {
      val p = Pack.chunkAssign(capped, "doc_id", "n_tokens", 512L)
      println(s"[curation]   packed rows: ${p.count()}, " +
        s"max shard: ${p.agg(max(col("shard_end"))).collect()(0).getLong(0)}")
    }
    println(f"[curation] TOTAL (incl. stage checkpoints) ${(System.nanoTime() - t00) / 1e9}%8.2f s")
    spark.stop()
  }
}
