package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Hashed Naive Bayes (NaiveBayes.scala): separable corpora classify
  * perfectly, micro-nat weights match the closed form, ties break to the
  * smallest class, null/empty text scores on priors, determinism across
  * partitionings, and the score pass plans without an exchange.
  */
class NaiveBayesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def corpus = {
    import spark.implicits._
    // two classes with disjoint vocabularies — separable by construction
    (0 until 120).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha alpha beta gamma", "en")
      else (i.toLong, "zeta zeta eta theta", "de")
    }.toDF("id", "text", "lang").repartition(5)
  }

  test("separable corpus classifies perfectly; score is an exact micro-nat sum") {
    import spark.implicits._
    val model = NaiveBayes.fit(corpus, "text", "lang")
    val out = NaiveBayes.score(corpus, "text", model)
      .select("id", "lang", "pred", "score")
      .as[(Long, String, String, Long)].collect()
    assert(out.length == 120)
    assert(out.forall(r => r._3 == r._2), out.filter(r => r._3 != r._2).take(3).mkString(","))
    // closed-form replay of one document's score: 60 'en' docs of 4 tokens
    // each -> t(en) = 240; alpha appears 120 times, beta/gamma 60 each.
    // prior(en) = floor(ln(0.5)*1e6 + .5); weight(tok) = floor(ln((c+1)/
    // (240+4096))*1e6 + .5) — the md5 buckets of 4 distinct words do not
    // collide mod 4096 here, asserted via the distinct-bucket check below.
    val md = java.security.MessageDigest.getInstance("MD5")
    val bs = Seq("alpha", "beta", "gamma").map(NaiveBayes.bucketOf(md, _, 4096))
    assert(bs.distinct.size == 3, s"unexpected md5 bucket collision: $bs")
    def w(c: Long) = math.floor(math.log((c + 1.0) / (240 + 4096)) * 1e6 + 0.5).toLong
    val expected = math.floor(math.log(0.5) * 1e6 + 0.5).toLong +
      2 * w(120) + w(60) + w(60)
    assert(out.find(_._1 == 0L).get._4 == expected)
  }

  test("ties break to the lexicographically smallest class") {
    import spark.implicits._
    // identical text and balanced classes -> identical scores everywhere
    val df = Seq((1L, "same same", "bb"), (2L, "same same", "aa"))
      .toDF("id", "text", "lang")
    val model = NaiveBayes.fit(df, "text", "lang")
    val preds = NaiveBayes.score(df, "text", model)
      .select("pred").as[String].collect().toSet
    assert(preds == Set("aa"))
  }

  test("null and empty text score on priors alone; null labels drop from fit") {
    import spark.implicits._
    val train = Seq((1L, "x x x", "en"), (2L, "x x", "en"), (3L, "y", "de"),
      (4L, "z", null)).toDF("id", "text", "lang")
    val model = NaiveBayes.fit(train, "text", "lang")
    assert(model.classes.toSeq == Seq("de", "en"))
    val score = NaiveBayes.score(
      Seq((10L, null: String), (11L, "")).toDF("id", "text"), "text", model)
      .select("pred", "score").as[(String, Long)].collect()
    // en has 2 of 3 labeled docs -> larger prior wins with no tokens
    assert(score.forall(_._1 == "en"))
    val pEn = math.floor(math.log(2.0 / 3.0) * 1e6 + 0.5).toLong
    assert(score.forall(_._2 == pEn))
  }

  test("deterministic across partitionings; no exchange in the score plan") {
    import spark.implicits._
    val model = NaiveBayes.fit(corpus, "text", "lang")
    def run(parts: Int) = NaiveBayes.score(corpus.repartition(parts), "text", model)
      .select("id", "pred", "score").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(run(1) == run(7))
    // a Range-backed frame: a LocalRelation would constant-fold the whole
    // projection away and leave no plan to assert on
    val planDf = spark.range(2).select(col("id"),
      concat(lit("tok"), col("id").cast("string")).as("text"))
    val plan = NaiveBayes.score(planDf, "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // Catalyst-native score: the relational lineage must survive (no
    // df.rdd round-trip severing the plan at an RDD scan), and the UDF
    // must evaluate ONCE per row (the struct projection must not be
    // collapsed into per-field duplicate calls)
    assert(!plan.contains("ExistingRDD"), plan)
    assert(plan.sliding("UDF(".length).count(_ == "UDF(") == 1, plan)
    intercept[IllegalArgumentException](NaiveBayes.fit(corpus, "text", "lang", buckets = 1))
    // a key-like label column fails loud before the driver model allocates
    intercept[IllegalArgumentException](NaiveBayes.fit(
      (0 until 4097).map(i => (i.toLong, "x", s"c$i")).toDF("id", "text", "lang"),
      "text", "lang"))
  }
}
