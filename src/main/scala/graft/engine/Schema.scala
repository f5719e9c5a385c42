package graft.engine

import java.sql.Timestamp

/** Typed row shapes of the engine. The input row is the BASELINE input_hint
  * contract `(url, warc_ts, html, text, lang)`; the output row is the
  * extraction contract `(url, extracted_text, spans, labels)` plus scale
  * metadata (fingerprints, counters) used by dedup/bench stages.
  */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String,
)

/** Nested span element — kept nested per document row so the whole inference
  * chain stays shuffle-free (SURVEY §3.1).
  */
final case class SpanT(start: Int, end: Int)

final case class LabeledSpan(
    label: String,
    start: Int,
    end: Int,
    text: String,
    confidence: Double,
    normalized: String,
)

final case class ExtractedDoc(
    url: String,
    extracted_text: String,
    spans: Array[SpanT],
    labels: Array[LabeledSpan],
    lang: String,
    n_tokens: Int,
    text_sha256: String,
    simhash: Long,
)

/** Label metadata — the broadcast config graph (Project/Category/LabelSet/
  * Label in the reference, data.py:370-860). KB-sized; never a join side.
  */
final case class LabelDef(
    name: String,
    dataType: String, // Text | Number | Positive Number | Date | Percentage | True/False
    threshold: Double,
    hasMultipleTopCandidates: Boolean = true,
    multiline: Boolean = false,
)

object Labels {
  /** The engine's fixed web-entity label set (the scorer's classes). */
  val all: Vector[LabelDef] = Vector(
    LabelDef("date", "Date", 0.5),
    // amount is multiline-capable: invoice total columns stack amounts in a
    // vertical block, which the reference merges via M4 (information_
    // extraction.py:3398-3408); mid-sentence amounts never merge because
    // the union box always contains foreign characters
    LabelDef("amount", "Number", 0.5, multiline = true),
    LabelDef("percent", "Percentage", 0.5),
    LabelDef("number", "Number", 0.6),
    LabelDef("email", "Text", 0.5),
    LabelDef("url", "Text", 0.5),
  )
  val byName: Map[String, LabelDef] = all.map(l => l.name -> l).toMap
  val NoLabel = "NO_LABEL"
}
