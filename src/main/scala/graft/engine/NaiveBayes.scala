package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashed multinomial Naive Bayes over whitespace tokens — the
  * fastText-class supervised scorer used for corpus curation (language
  * routing, quality-classifier distillation): a distributed closed-form
  * fit plus a narrow broadcast-model score.
  *
  * Why this shape for 100 TB:
  *   - '''fit''' is ONE aggregation over exploded tokens whose key space
  *     is capped at `buckets × classes` (feature hashing) — map-side
  *     partial aggregation collapses the token stream before the shuffle,
  *     so the exchange carries at most tens of thousands of rows no
  *     matter the corpus size. The collected model is KBs (the
  *     centroid-collect class of justified driver reads).
  *   - '''score''' ships the model in a broadcast and runs one narrow
  *     `mapPartitions` — the corpus is read once and never shuffled
  *     (the [[Bpe.encodeIds]] model-in-closure discipline).
  *
  * Why it replays in SQL: every model weight is a FIXED-POINT integer —
  * `w(b,cls) = floor(ln((c+1)/(t+B))·10^6 + 0.5)` micro-nats (add-one
  * smoothing; `c` = token count of bucket b in class cls, `t` = class
  * token total, `B` = buckets) and `prior(cls) = floor(ln(n_cls/n)·10^6
  * + 0.5)`. Document scores are then BIGINT sums of those integers —
  * exact in any engine and any summation order — and the argmax needs no
  * float comparison (ties break to the lexicographically smallest class;
  * `classes` is sorted, so index order IS that order). The only float
  * surface is one `ln` per DISTINCT (bucket, class) pair, pinned by the
  * half-up micro-nat rounding (the q60 integer-exact-mass discipline).
  *
  * Tokenization is the corpus contract's exact `string_split(text, ' ')`
  * with empties dropped (the q66 oracle parity); the bucket is the first
  * 15 md5 hex digits mod `buckets` — the same md5 coordinate family as
  * [[Sampling.hashCoord]], byte-identical in Spark, the JVM digest, and
  * DuckDB.
  */
object NaiveBayes {

  /** classes sorted ascending; priors/weights in micro-nats;
    * weights(bucket)(classIdx) includes the smoothed default for unseen
    * buckets, so lookup is total. */
  final case class Model(classes: Array[String], priors: Array[Long],
      weights: Array[Array[Long]], buckets: Int)

  private def microNat(x: Double): Long =
    math.floor(math.log(x) * 1e6 + 0.5).toLong

  /** First 15 md5 hex digits of the token's UTF-8 bytes, mod `buckets` —
    * bytes 0..6 in full plus the high nibble of byte 7 (60 bits, always
    * non-negative). */
  private[engine] def bucketOf(md: java.security.MessageDigest,
      token: String, buckets: Int): Int = {
    val d = md.digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(7) & 0xf0L) >>> 4)
    (v % buckets).toInt
  }

  /** Closed-form fit: hashed token counts per class + class priors.
    * Rows with a null label or null text are dropped (they can neither
    * label nor tokenize). */
  def fit(df: DataFrame, textCol: String, labelCol: String,
      buckets: Int = 4096): Model = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"NaiveBayes.fit: buckets must be in [2, 2^20], got $buckets")
    val clean = df.filter(col(labelCol).isNotNull && col(textCol).isNotNull)
    val tok = clean.select(col(labelCol).cast("string").as("cls"),
        explode(split(col(textCol), " ")).as("t"))
      .filter(col("t") =!= "")
      .select(col("cls"),
        (conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long")
          % buckets).cast("int").as("b"))
    // ≤ buckets × classes rows — the bounded model, a justified collect
    val counts = tok.groupBy("cls", "b").count().collect()
    val docCounts = clean
      .groupBy(col(labelCol).cast("string").as("cls")).count().collect()
    require(docCounts.nonEmpty, "NaiveBayes.fit: no labeled rows")
    require(docCounts.length <= 4096,
      s"NaiveBayes.fit: ${docCounts.length} distinct labels — the driver-side " +
        "model is buckets x classes; a label column this wide is a key, not a class")
    val classes = docCounts.map(_.getString(0)).sorted
    val clsIdx = classes.zipWithIndex.toMap
    val nDocs = docCounts.map(_.getLong(1)).sum
    val priors = new Array[Long](classes.length)
    docCounts.foreach { r =>
      priors(clsIdx(r.getString(0))) = microNat(r.getLong(1).toDouble / nDocs)
    }
    val tokTotals = new Array[Long](classes.length)
    counts.foreach(r => tokTotals(clsIdx(r.getString(0))) += r.getLong(2))
    val weights = Array.tabulate(buckets, classes.length) { (_, c) =>
      microNat(1.0 / (tokTotals(c) + buckets))
    }
    counts.foreach { r =>
      val c = clsIdx(r.getString(0))
      weights(r.getInt(1))(c) =
        microNat((r.getLong(2) + 1.0) / (tokTotals(c) + buckets))
    }
    Model(classes, priors, weights, buckets)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5") // getInstance has JCA lock contention
  }

  /** The per-document scoring kernel: integer micro-nat sums over the
    * broadcast weight table, argmax with ties to the smallest class index.
    * Pure; shared by [[score]] and any caller embedding the model.
    */
  def scoreOne(m: Model, text: String): (String, Long) = {
    val md = md5Local.get()
    val k = m.classes.length
    val scores = m.priors.clone()
    if (text != null) {
      text.split(" ", -1).foreach { tkn =>
        if (tkn.nonEmpty) {
          val w = m.weights(bucketOf(md, tkn, m.buckets))
          var c = 0
          while (c < k) { scores(c) += w(c); c += 1 }
        }
      }
    }
    var best = 0
    var c = 1
    while (c < k) { if (scores(c) > scores(best)) best = c; c += 1 }
    (m.classes(best), scores(best))
  }

  /** Appends `predCol` (winning class) and `scoreCol` (its micro-nat
    * log-posterior, a BIGINT) to every row. Null/empty text scores on the
    * priors alone. One narrow pass, model broadcast — no shuffle.
    *
    * Catalyst-native: the kernel runs as a scalar UDF over the text column
    * only, so the plan keeps the relational lineage (column pruning and
    * filter pushdown reach the scan; AQE still plans downstream exchanges)
    * instead of the previous `df.rdd.mapPartitions` + `createDataFrame`
    * round-trip, which severed the plan at an RDD scan boundary, converted
    * every row InternalRow↔Row both ways, and shipped ALL columns through
    * the closure. Spec-asserted (NaiveBayesSpec: no ExistingRDD scan in
    * the scored plan).
    */
  def score(df: DataFrame, textCol: String, model: Model,
      predCol: String = "pred", scoreCol: String = "score"): DataFrame = {
    val spark = df.sparkSession
    val bm = spark.sparkContext.broadcast(model)
    val scoreUdf = udf { (text: String) => scoreOne(bm.value, text) }
    // temp column name that cannot clobber a caller's column
    var tmp = "__nb"
    while (df.columns.contains(tmp)) tmp += "_"
    df.withColumn(tmp, scoreUdf(col(textCol)))
      .withColumn(predCol, col(s"$tmp._1"))
      .withColumn(scoreCol, col(s"$tmp._2"))
      .drop(tmp)
  }
}
