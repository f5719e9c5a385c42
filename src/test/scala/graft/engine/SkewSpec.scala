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
}
