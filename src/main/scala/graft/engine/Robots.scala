package graft.engine

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Robots-exclusion (RFC 9309) compliance for the crawl frontier: parse one
  * robots.txt per host into prefix/wildcard rules and filter candidate URLs
  * by longest-match-wins (allow wins ties, no matching rule = allowed).
  *
  * Scale shape: the rules side is one small row per HOST (the web has
  * ~10^8 hosts vs 10^12 pages), parsed once and broadcast; the frontier
  * side never shuffles — one broadcast hash join on host plus a narrow
  * per-row longest-match kernel. Rule matching is RFC 9309 §2.2.2:
  * `*` matches any char run, `$` anchors the pattern end, specificity =
  * pattern length in chars.
  */
object Robots {

  /** One access rule: `allow` and the raw path pattern (may contain `*`
    * and a trailing `$`).
    */
  final case class Rule(allow: Boolean, pattern: String)

  /** Parse a robots.txt body for `agent`: rules of the best-matching
    * user-agent group(s). Group selection per RFC 9309 §2.2.1: the group
    * whose product token equals `agent` (case-insensitive) wins; else the
    * `*` group; multiple User-agent lines may share one rule block; a
    * blank Disallow line contributes no rule. Comments (`#`) strip.
    */
  def parse(txt: String, agent: String): Vector[Rule] = {
    if (txt == null) return Vector.empty
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val exact = Vector.newBuilder[Rule]
    val star = Vector.newBuilder[Rule]
    var sawExact = false
    // state: which groups the CURRENT rule block belongs to
    var curExact = false
    var curStar = false
    var inAgentRun = false // consecutive User-agent lines stack onto one group
    txt.split("\n", -1).foreach { raw =>
      val noComment = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }
      val line = noComment.trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!inAgentRun) { curExact = false; curStar = false; inAgentRun = true }
              val tok = value.toLowerCase(java.util.Locale.ROOT)
              if (tok == agentLc) { curExact = true; sawExact = true }
              else if (tok == "*") curStar = true
            case "allow" | "disallow" =>
              inAgentRun = false
              if (value.nonEmpty) {
                val r = Rule(key == "allow", value)
                if (curExact) exact += r
                if (curStar) star += r
              }
            case _ => inAgentRun = false // crawl-delay, sitemap, unknown keys
          }
        }
      }
    }
    if (sawExact) exact.result() else star.result()
  }

  /** RFC 9309 §2.2.2 pattern match: `*` matches any (possibly empty) char
    * run; a trailing `$` anchors the end; otherwise the pattern is a
    * prefix match. Greedy segment scan — no regex compilation per row.
    */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    // split into literal segments separated by '*'
    var pi = 0 // pattern cursor
    var si = 0 // path cursor
    var firstSeg = true
    val n = pat.length
    while (pi < n) {
      val starAt = pat.indexOf('*', pi)
      val segEnd = if (starAt < 0) n else starAt
      val segLen = segEnd - pi
      if (segLen > 0) {
        if (firstSeg) {
          // leading literal must match at the path START (prefix semantics)
          if (!path.regionMatches(si, pat, pi, segLen)) return false
          si += segLen
        } else {
          // after a '*': find the segment anywhere at/after si; if the
          // pattern ends with this segment and is anchored, it must match
          // at the END — handled below by re-checking the tail
          val idx = path.indexOf(pat.substring(pi, segEnd), si)
          if (idx < 0) return false
          si = idx + segLen
        }
      }
      firstSeg = false
      pi = if (starAt < 0) n else starAt + 1
      // pattern ends with '*': matches anything remaining, anchored or not
      if (starAt >= 0 && pi >= n) return true
    }
    if (anchored) {
      // the last literal segment must END the path. A greedy leftmost scan
      // may have stopped early; accept if the path's tail equals the final
      // segment (covers 'seg*tail$' by re-anchoring the tail).
      val lastStar = pat.lastIndexOf('*')
      val tail = pat.substring(lastStar + 1)
      if (lastStar < 0) si == path.length
      else path.length >= si && path.endsWith(tail)
    } else true
  }

  /** Longest-match-wins verdict: among matching rules, the longest pattern
    * decides; allow wins length ties; no matching rule means allowed.
    */
  def isAllowed(rules: IndexedSeq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      if (matches(r.pattern, path)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len; bestAllow = r.allow
        }
      }
      i += 1
    }
    bestAllow
  }

  /** Path+query of a URL (the robots matching target): everything from the
    * first `/` after the authority; no authority slash → "/".
    */
  def pathOf(url: String): String = {
    if (url == null) return "/"
    val schemeAt = url.indexOf("://")
    val authStart = if (schemeAt >= 0) schemeAt + 3 else 0
    val slash = url.indexOf('/', authStart)
    if (slash < 0) "/" else url.substring(slash)
  }

  /** Filter the frontier to robots-allowed URLs. `robots` is one row per
    * host `(host, robots_txt)`; rules parse once on that (small) side and
    * broadcast; frontier rows keep all their columns and never shuffle.
    * URLs on hosts with no robots row are allowed (the fetch-404
    * convention). Matching runs in one narrow kernel after the broadcast
    * join.
    */
  def filterAllowed(frontier: DataFrame, urlCol: String, robots: DataFrame,
      agent: String): DataFrame = {
    val spark = frontier.sparkSession
    import spark.implicits._
    val parsed = robots
      .select(col("host").cast("string"), col("robots_txt").cast("string"))
      .as[(String, String)]
      .map { case (h, txt) =>
        (h, parse(txt, agent).map(r => (r.allow, r.pattern)))
      }
      .toDF("__robots_host", "__robots_rules")
    val joined = frontier
      .join(broadcast(parsed),
        Blocklist.hostOf(col(urlCol)) === col("__robots_host"), "left")
    val outSchema = StructType(frontier.schema.fields)
    val urlIdx = frontier.schema.fieldIndex(urlCol)
    val nOut = outSchema.length
    val rulesIdx = joined.schema.fieldIndex("__robots_rules")
    joined.mapPartitions { it =>
      it.filter { row =>
        val rulesRaw = if (row.isNullAt(rulesIdx)) null else row.getSeq[Row](rulesIdx)
        rulesRaw == null || rulesRaw.isEmpty || {
          val rules = rulesRaw.map(r => Rule(r.getBoolean(0), r.getString(1))).toIndexedSeq
          isAllowed(rules, pathOf(row.getString(urlIdx)))
        }
      }.map(row => Row.fromSeq((0 until nOut).map(row.get)))
    }(Encoders.row(outSchema))
  }
}
