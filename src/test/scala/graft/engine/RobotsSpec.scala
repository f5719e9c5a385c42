package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 robots-exclusion semantics (q88): group selection, wildcard +
  * anchor matching, longest-match-wins, and the broadcast-join frontier
  * filter's plan shape.
  */
class RobotsSpec extends AnyFunSuite {
  import Robots._

  private val txt =
    """# policy
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/ok
      |
      |User-agent: a
      |User-agent: b
      |Disallow: /ab/
      |
      |User-agent: *
      |Disallow: /star/
      |Allow:
      |""".stripMargin

  test("parse: exact agent group shadows the * group") {
    assert(parse(txt, "graftbot") ==
      Vector(Rule(allow = false, "/private/"), Rule(allow = true, "/private/ok")))
  }

  test("parse: stacked User-agent lines share one rule block") {
    assert(parse(txt, "B") == Vector(Rule(allow = false, "/ab/")))
  }

  test("parse: unknown agent falls back to *; empty rule values drop") {
    assert(parse(txt, "other") == Vector(Rule(allow = false, "/star/")))
  }

  test("parse: no matching group at all means no rules") {
    assert(parse("User-agent: x\nDisallow: /\n", "y").isEmpty)
  }

  test("matches: prefix, wildcard, and $ anchor") {
    assert(matches("/p/", "/p/page1"))
    assert(!matches("/p/", "/q/page1"))
    assert(matches("/p/*.html", "/p/a/b.html"))
    assert(matches("/p/page*0$", "/p/page30"))
    assert(!matches("/p/page*0$", "/p/page304"))
    assert(matches("/p*$", "/pXYZ"))
    assert(matches("*", "/anything"))
    assert(matches("/a*bc$", "/aXbcYbc"))
    assert(!matches("/exact$", "/exactly"))
    assert(matches("/exact$", "/exact"))
  }

  test("isAllowed: longest match wins, allow wins ties, no rule = allowed") {
    val rules = Vector(
      Rule(allow = false, "/p/"),
      Rule(allow = true, "/p/open"))
    assert(!isAllowed(rules, "/p/secret"))
    assert(isAllowed(rules, "/p/open/x"))
    assert(isAllowed(rules, "/elsewhere"))
    // exact tie: allow wins
    assert(isAllowed(Vector(Rule(false, "/t/"), Rule(true, "/t/")), "/t/x"))
  }

  test("pathOf: authority stripped, bare host maps to /") {
    assert(pathOf("https://h.example/a/b?q=1") == "/a/b?q=1")
    assert(pathOf("https://h.example") == "/")
  }

  test("filterAllowed: rules broadcast, frontier keeps columns, no-row hosts pass") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val frontier = Seq(
      (1L, "https://a.example/private/x"),
      (2L, "https://a.example/private/ok/y"),
      (3L, "https://a.example/public"),
      (4L, "https://norobots.example/anything")).toDF("id", "url")
    val robots = Seq(
      ("a.example", "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"))
      .toDF("host", "robots_txt")
    val out = Robots.filterAllowed(frontier, "url", robots, "graftbot")
    assert(out.columns.toSeq == Seq("id", "url"))
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))
    // scale shape: ONE broadcast join, no shuffle exchange on the frontier
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast join:\n$plan")
    assert(!plan.contains("ShuffleExchange"), s"frontier must not shuffle:\n$plan")
  }
}
