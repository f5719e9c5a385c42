package graft.engine

import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The flagship inference pipeline (SURVEY §3.1 re-expressed Spark-first):
  *
  *   scan → [narrow] html-strip → tokenize → featurize/score → merge → emit
  *
  * One shuffle-free `mapPartitions` chain: spans stay nested per document
  * row, so the plan is a single WholeStage-friendly narrow pipeline whatever
  * the cluster size — the key property for 10^12-row scale (per-document
  * work is embarrassingly parallel; no exchange until an explicit
  * evaluation/dedup join needs one).
  */
object Extraction {

  def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** "12,34 %" arrives as two whitespace tokens; when an amount span is
    * followed (gap ≤ 1 space, same line) by a bare '%' token, relabel the
    * combined interval as a percentage iff it still normalizes — the M2
    * type-preserving rule applied across the token boundary.
    */
  private[engine] def attachPercentSigns(
      text: String, spans: Seq[Span], scored: Vector[Scorer.Scored]): Vector[Scorer.Scored] = {
    val pctStarts = spans.iterator
      .filter(sp => sp.end - sp.start == 1 && text.charAt(sp.start) == '%')
      .map(sp => sp.start -> sp).toMap
    scored.map { sc =>
      if (sc.label == "amount" || sc.label == "number") {
        val gapOk = (1 to 2).find { g =>
          pctStarts.contains(sc.span.end + g - 1) &&
            (g == 1 || text.charAt(sc.span.end) == ' ')
        }
        gapOk.flatMap { g =>
          val pct = pctStarts(sc.span.end + g - 1)
          val slice = text.substring(sc.span.start, pct.end)
          Normalize.normalizeToPercentage(slice).map(v =>
            Scorer.Scored(Span(sc.span.start, pct.end), "percent", sc.confidence, v.toString))
        }.getOrElse(sc)
      } else sc
    }
  }

  /** Extract one page row — pure function, the unit of determinism: the
    * output depends only on the row's bytes (byte-identical per url across
    * runs and parallelism levels).
    */
  def extractOne(row: PageRow): ExtractedDoc = {
    val text =
      if (row.text != null && row.text.nonEmpty) row.text // reference-parity path: pre-extracted
      else if (row.html != null && row.html.nonEmpty) Html.extract(Html.decodeBytes(row.html)).text
      else ""
    val spans = Rx.tokenSpans(text, Tokenizers.whitespace)
    val scored = attachPercentSigns(text, spans, Scorer.scoreSpans(text, spans))
    val merged = Merge.mergeHorizontal(text, scored)
    ExtractedDoc(
      url = row.url,
      extracted_text = text,
      spans = spans.iterator.map(s => SpanT(s.start, s.end)).toArray,
      labels = merged.iterator.map(m =>
        LabeledSpan(m.label, m.span.start, m.span.end,
          text.substring(m.span.start, m.span.end), m.confidence, m.normalized)).toArray,
      lang = if (row.lang != null && row.lang.nonEmpty) row.lang else LangId.detect(text),
      n_tokens = spans.length,
      text_sha256 = sha256Hex(text),
      simhash = Fingerprint.simhash64(text),
    )
  }

  /** Typed pipeline: Dataset[PageRow] → Dataset[ExtractedDoc], zero shuffle. */
  def extract(pages: Dataset[PageRow]): Dataset[ExtractedDoc] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.mapPartitions(_.map(extractOne))
  }

  /** Synthesize the input corpus as a Dataset — deterministic per index, so
    * any partitioning yields the same rows (used by tests and benches; at
    * production scale this is replaced by the Iceberg/parquet scan).
    */
  def syntheticPages(spark: SparkSession, n: Long, partitions: Int): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).mapPartitions(_.map { i =>
      val p = graft.corpus.WebCorpus.page(i)
      PageRow(p.url, p.warc_ts, p.html, p.text, p.lang)
    })
  }

  /** DataFrame view of the extraction output for the SQL surface. */
  def extractDF(spark: SparkSession, n: Long, partitions: Int): DataFrame =
    extract(syntheticPages(spark, n, partitions)).toDF()
}
