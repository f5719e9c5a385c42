package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** URL/domain blocklist filtering (Blocklist.scala): host parsing edge
  * cases, registered-domain suffix logic, the integer-exact soft-word
  * score, and the broadcast-join plan shape.
  */
class BlocklistSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def hostsOf(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(Blocklist.hostOf(col("u"))).as[String].collect().toSeq
  }

  test("hostOf: case, port, userinfo, scheme variants, non-urls") {
    assert(hostsOf(Seq(
      "https://Example.COM/x",
      "http://example.com:8080/a?b=1",
      "HTTPS://user:pw@Sub.Example.com:443/p",
      "ftp://Files.Example.org",
      "https://example.com",
      "not a url",
      "/relative/path")) ==
      Seq("example.com", "example.com", "sub.example.com",
        "files.example.org", "example.com", "", ""))
  }

  test("registeredDomain: last-two labels unless a multi-label suffix") {
    import spark.implicits._
    val doms = Seq("example.com", "a.b.example.com", "shop.x.co.uk",
      "x.co.uk", "localhost", "co.uk").toDF("h")
      .select(Blocklist.registeredDomain(col("h"), Seq("co.uk", "com.au")))
      .as[String].collect().toSeq
    assert(doms == Seq("example.com", "example.com", "x.co.uk",
      "x.co.uk", "localhost", "co.uk"))
  }

  test("filterDocs: hard blocklist + weighted soft score, integer-exact") {
    import spark.implicits._
    val docs = Seq(
      (0L, "https://a.good.com/x", "plain text here"),
      (1L, "https://www.evil.com/x", "plain text here"),
      (2L, "https://sub.spam.co.uk/x", "plain text here"),
      (3L, "https://b.good.com/x", "casino casino night"),
      (4L, "https://c.good.com/x", "buy one casino token now please ok")
    ).toDF("doc_id", "url", "text")
    val blocked = Seq("evil.com", "spam.co.uk").toDF("domain")
    val out = Blocklist.filterDocs(docs, "url", "text", blocked,
        Map("casino" -> 5, "buy" -> 1), maxBadPerMille = 900L)
      .select("doc_id", "reg_domain", "host_blocked", "n_tokens", "bad_score", "keep")
      .as[(Long, String, Int, Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, "good.com", 0, 3L, 0L, 1),
      (1L, "evil.com", 1, 3L, 0L, 0),          // hard-blocked
      (2L, "spam.co.uk", 1, 3L, 0L, 0),        // multi-label suffix block
      (3L, "good.com", 0, 3L, 10L, 0),         // 2·5 per 3 tokens > 900‰
      (4L, "good.com", 0, 7L, 6L, 1)))         // 6·1000 ≤ 900·7
  }

  test("blocklist join broadcasts; corpus side stays shuffle-free") {
    import spark.implicits._
    val docs = Seq((0L, "https://a.good.com/x", "t")).toDF("doc_id", "url", "text")
    val out = Blocklist.filterDocs(docs, "url", "text",
      Seq("evil.com").toDF("domain"), Map("x" -> 1), 10L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"))
  }
}
