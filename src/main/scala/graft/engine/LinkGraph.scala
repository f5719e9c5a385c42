package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-frontier analytics over the page hyperlink graph: host-level edge
  * extraction from raw markup and bounded-iteration PageRank — the two
  * operators a crawl scheduler needs (where do hosts point, which hosts
  * matter) expressed as keyed DataFrame work with no driver-side graph.
  */
object LinkGraph {

  /** One (src_host, dst_host) row PER HYPERLINK extracted from `htmlCol`
    * (multiplicity preserved — out-degree and rank contributions weight
    * repeated links, so the aggregation decision belongs to the caller).
    * Absolute http(s) links take their own host; scheme-less links resolve
    * to the source host when `resolveRelative` (protocol-relative `//host`
    * links take the named host); mailto:/javascript:/fragment and other
    * non-http schemes drop. Link extraction is one narrow mapPartitions
    * (decode + href scan); host parsing is the codegen'd
    * [[Blocklist.hostOf]] column. Empty hosts (unparseable) drop.
    */
  def hostEdges(df: DataFrame, urlCol: String, htmlCol: String,
      resolveRelative: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df
      .select(col(urlCol).cast("string"), col(htmlCol).cast("binary"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (u, h) =>
        if (h == null || u == null) Iterator.empty
        else graft.core.Html.links(graft.core.Html.decodeBytes(h)).iterator.map(l => (u, l))
      })
      .toDF("src_url", "link")
    val httpAbs = col("link").rlike("(?i)^https?://")
    val protoRel = col("link").startsWith("//")
    val schemed = col("link").rlike("(?i)^[a-z][a-z0-9+.-]*:")
    val srcHost = Blocklist.hostOf(col("src_url"))
    pairs
      .filter(httpAbs ||
        (lit(resolveRelative) && !schemed && !col("link").startsWith("#")))
      .select(
        srcHost.as("src_host"),
        when(httpAbs, Blocklist.hostOf(col("link")))
          .when(protoRel, Blocklist.hostOf(concat(lit("https:"), col("link"))))
          .otherwise(srcHost)
          .as("dst_host"))
      .filter(col("src_host") =!= "" && col("dst_host") =!= "")
  }

  /** [[hostEdges]] plus the link's anchor text:
    * `(src_host, dst_host, anchor)` per hyperlink, same scheme filtering
    * and relative resolution. Anchor text is the element's inner text
    * (tags stripped, entity-decoded, whitespace-collapsed) — the classic
    * IR signal: what the WEB calls the target, aggregated downstream into
    * per-host anchor vocabularies. Same narrow-parse shape as hostEdges.
    */
  def anchorEdges(df: DataFrame, urlCol: String, htmlCol: String,
      resolveRelative: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df
      .select(col(urlCol).cast("string"), col(htmlCol).cast("binary"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (u, h) =>
        if (h == null || u == null) Iterator.empty
        else graft.core.Html.anchors(graft.core.Html.decodeBytes(h)).iterator
          .map { case (l, a) => (u, l, a) }
      })
      .toDF("src_url", "link", "anchor")
    val httpAbs = col("link").rlike("(?i)^https?://")
    val protoRel = col("link").startsWith("//")
    val schemed = col("link").rlike("(?i)^[a-z][a-z0-9+.-]*:")
    val srcHost = Blocklist.hostOf(col("src_url"))
    pairs
      .filter(httpAbs ||
        (lit(resolveRelative) && !schemed && !col("link").startsWith("#")))
      .select(
        srcHost.as("src_host"),
        when(httpAbs, Blocklist.hostOf(col("link")))
          .when(protoRel, Blocklist.hostOf(concat(lit("https:"), col("link"))))
          .otherwise(srcHost)
          .as("dst_host"),
        col("anchor"))
      .filter(col("src_host") =!= "" && col("dst_host") =!= "")
  }

  /** Power-iteration PageRank over host edges: `iters` rounds of
    * rank' = (1-d)/N + d·(Σ_in rank/out + danglingMass/N), dangling mass
    * (hosts with no outlinks) redistributed uniformly, uniform 1/N start.
    * Everything is keyed joins and aggregations — edges and out-degrees
    * materialize once, each round is one join-shuffle on src plus one on
    * dst, and the new rank vector is localCheckpoint'd so lineage stays
    * one-round deep (the [[Dedup.resolveClusters]] discipline). The
    * per-round dangling sum is a one-row aggregate collect — bounded and
    * justified. At web scale rounds are O(E) shuffles each; callers bound
    * `iters` (the crawl-scheduling convention — ~10 rounds, not
    * convergence-tested) rather than looping to a tolerance.
    */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col("src_host").as("src"), col("dst_host").as("dst"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("host"))
      .unionByName(e.select(col("dst").as("host")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank", lit(0.0))
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("out")).localCheckpoint(true)
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val dangling = ranks
        .join(outDeg, ranks("host") === outDeg("src"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
      val contribs = e
        .join(ranks, e("src") === ranks("host"))
        .join(outDeg, Seq("src"))
        .select(col("dst").as("host"), (col("rank") / col("out")).as("c"))
        .groupBy("host").agg(sum("c").as("contrib"))
      ranks = nodes
        .join(contribs, Seq("host"), "left")
        .select(col("host"),
          (lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) + lit(dangling / n)))
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
