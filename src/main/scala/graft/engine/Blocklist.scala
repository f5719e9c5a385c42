package graft.engine

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** URL/domain blocklist filtering — the first gate of a web-corpus
  * pipeline (RefinedWeb §3.1 runs a UT1-style blocklist of ~4.6M domains
  * plus a weighted soft-word score before any content heuristic;
  * C4 applies a "bad words" list the same way).
  *
  * All decisions are integer-exact so a SQL oracle replays them:
  *   - hard gate: the url's registered domain appears in the blocklist;
  *   - soft gate: Σ weight(w)·occurrences(w) per mille of the token count
  *     exceeds `maxBadPerMille`.
  *
  * Scale shape: host/domain extraction and the word scores are narrow
  * codegen'd expressions (regexp + array built-ins, no UDF); the
  * blocklist join is a broadcast left join keyed on registered domain —
  * a 4.6M-domain list is tens of MB, comfortably broadcast, so the
  * corpus side never shuffles. Zero wide operators in the whole filter.
  */
object Blocklist {

  /** Lowercased host of a scheme://… url: authority minus userinfo and
    * port. Empty string when the value does not look like an absolute
    * url. Pure built-ins (regexp_extract/split), codegen-friendly.
    */
  def hostOf(url: Column): Column = {
    val auth = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val noUser = element_at(split(auth, "@"), -1)
    lower(regexp_replace(noUser, ":[0-9]*$", ""))
  }

  /** Registered domain of a host: the last two labels, or the last three
    * when the last two form a multi-label public suffix ("co.uk" →
    * example.co.uk). `multiLabelSuffixes` here is a literal IN chain —
    * right for the handful of suffixes a test corpus uses; a full public
    * suffix list (~9k entries) should instead be broadcast-joined on the
    * last-two-labels key, same plan shape as the blocklist join below.
    */
  def registeredDomain(host: Column, multiLabelSuffixes: Seq[String]): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    val lastTwo = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val lastThree = concat_ws(".",
      element_at(parts, -3), element_at(parts, -2), element_at(parts, -1))
    val multiSuffix: Column =
      if (multiLabelSuffixes.isEmpty) lit(false)
      else n >= 3 && lastTwo.isin(multiLabelSuffixes.map(_.asInstanceOf[Any]): _*)
    when(n <= 2, host)
      .when(multiSuffix, lastThree)
      .otherwise(lastTwo)
  }

  /** Annotate + gate a corpus. Adds columns: host, reg_domain,
    * host_blocked (0/1), n_tokens, bad_score, keep (0/1). Rows are NOT
    * dropped — `keep` is a column so callers can audit the rejected
    * stratum (the standard curation practice); chain `.where(col("keep")
    * === 1)` to materialize the filter.
    *
    * @param blockedDomains one-column DataFrame `domain: string` of
    *        registered domains to hard-block (broadcast).
    * @param badWeights word → integer weight for the soft score; counted
    *        as whole space-separated tokens, case-sensitive (normalize
    *        upstream if needed).
    * @param maxBadPerMille keep requires bad_score·1000 ≤ this·n_tokens.
    */
  def filterDocs(df: DataFrame, urlCol: String, textCol: String,
      blockedDomains: DataFrame, badWeights: Map[String, Int],
      maxBadPerMille: Long,
      multiLabelSuffixes: Seq[String] = Seq("co.uk", "com.au", "co.jp")): DataFrame = {
    val host = hostOf(col(urlCol))
    val withDom = df
      .withColumn("host", host)
      .withColumn("reg_domain", registeredDomain(col("host"), multiLabelSuffixes))
    val joined = withDom.join(
      F.broadcast(blockedDomains.select(col("domain").as("reg_domain"),
        lit(1).as("host_blocked"))),
      Seq("reg_domain"), "left")
      .withColumn("host_blocked", coalesce(col("host_blocked"), lit(0)))
    val toks = filter(split(col(textCol), " ", -1), x => x =!= "")
    // deterministic column order for the fold: sort the word map
    val badScore = badWeights.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (w, wt)) =>
        acc + size(filter(toks, x => x === lit(w))).cast("long") * lit(wt.toLong)
    }
    joined
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("bad_score", badScore)
      .withColumn("keep",
        when(col("host_blocked") === 0 &&
          col("bad_score") * lit(1000L) <= lit(maxBadPerMille) * col("n_tokens"),
          lit(1)).otherwise(lit(0)))
  }
}
