package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("salted two-phase agg equals plain agg on a skewed key") {
    import spark.implicits._
    // 90% of rows on one hot key
    val df = (0 until 5000).map(i => (if (i % 10 < 9) "hot" else s"cold${i % 7}", i.toLong))
      .toDF("k", "v")
    val salted = Skew.twoPhaseAgg(df, "k", nSalts = 8, Seq(
      (count(lit(1)), (c: String) => sum(col(c)), "n"),
      (sum(col("v")), (c: String) => sum(col(c)), "s"),
    )).orderBy("k").as[(String, Long, Long)].collect()
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").as[(String, Long, Long)].collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted repartition spreads a hot key over partitions") {
    import spark.implicits._
    val df = (0 until 4000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val parts = Skew.saltedRepartition(df, "k", nSalts = 8, numPartitions = 8)
      .rdd.glom().map(_.length).collect().filter(_ > 0)
    assert(parts.length > 1, s"hot key stayed on one partition: ${parts.toSeq}")
  }

  test("withSalt refuses shuffle-derived and nondeterministic inputs in code") {
    import spark.implicits._
    val scan = (0 until 100).map(i => ("k", i.toLong)).toDF("k", "v")
    // scan-direct (local relation + project/filter) passes
    assert(Skew.withSalt(scan.filter(col("v") >= 0), 4).columns.contains("__salt"))
    // sortWithinPartitions is shuffle-free and deterministic — must pass
    assert(Skew.withSalt(scan.sortWithinPartitions("v"), 4).columns.contains("__salt"))
    // an upstream aggregate (recomputable shuffle) is refused loudly
    val agg = scan.groupBy("k").agg(sum("v").as("s"))
    val e1 = intercept[IllegalArgumentException](Skew.withSalt(agg, 4))
    assert(e1.getMessage.contains("SPARK-23207"))
    // a nondeterministic expression upstream is refused too
    val nondet = scan.withColumn("r", rand())
    val e2 = intercept[IllegalArgumentException](Skew.withSalt(nondet, 4))
    assert(e2.getMessage.contains("SPARK-23207"))
  }

  test("withSaltStable salts shuffle-derived input deterministically across evaluations") {
    import spark.implicits._
    val df = (0 until 2000).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
      .groupBy("k").agg(sum("v").as("s"))
    val salted = Skew.withSaltStable(df, 8)
    def snap() = salted.select("k", "__salt").as[(String, Long)].collect().toSeq.sorted
    // two separate actions over the same plan: the checkpointed blocks make
    // the (partition, position)-derived salts identical
    assert(snap() == snap())
    // and the two-phase agg over a SHUFFLED input works via stable = true
    val two = Skew.twoPhaseAgg(df, "k", nSalts = 4,
      Seq((sum(col("s")), (c: String) => sum(col(c)), "t")), stable = true)
      .orderBy("k").as[(String, Long)].collect().toSeq
    val plain = df.groupBy("k").agg(sum("s").as("t")).orderBy("k")
      .as[(String, Long)].collect().toSeq
    assert(two == plain)
  }
}
