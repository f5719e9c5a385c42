package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite {

  test("native expressions registered via SparkSessionExtensions, callable from SQL") {
    // force a NEW session over the (possibly) shared context so the
    // extensions actually apply — getOrCreate would return a pre-existing
    // session and skip them
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // NOTE: no spark.stop() — the SparkContext is shared with the other
      // suites in this JVM; only the session (with its extensions) is new.
      spark.sparkContext.setLogLevel("ERROR")
      val row = spark.sql(
        "SELECT graft_token_count('one two  three') AS n, graft_simhash64('hello world') AS h")
        .collect()(0)
      assert(row.getAs[Int]("n") == 3)
      assert(row.getAs[Long]("h") == graft.core.Fingerprint.simhash64("hello world"))
    } finally {
      prior.foreach { p => SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p) }
    }
  }

  test("token_count Column API agrees with the pure counter") {
    val spark = graft.engine.SparkTestBase.spark
    import spark.implicits._
    val texts = Seq("a b c", "", "  x ", "line\nbreak\ttab")
    val got = texts.toDF("t")
      .select(GraftFunctions.token_count($"t").as("n"))
      .as[Int].collect().toSeq
    assert(got == texts.map(graft.core.Quality.tokenCount))
  }
}
