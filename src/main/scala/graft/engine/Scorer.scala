package graft.engine

import graft.core.{Features, Normalize, Span}

/** Deterministic per-span classifier: regex/normalization predicates + a
  * fixed-weight logistic over the span feature vector. Replaces the
  * reference's RandomForest (information_extraction.py:2950-2963) with a
  * broadcast-friendly pure function — identical scores on any executor, any
  * partitioning (SURVEY §7.3: determinism under parallelism beats Spark ML
  * nondeterminism here). Confidence = sigmoid(w·x + prior).
  */
object Scorer {

  final case class Scored(span: Span, label: String, confidence: Double, normalized: String)

  @inline private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  private val emailRe = java.util.regex.Pattern.compile("^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$")
  private val urlRe = java.util.regex.Pattern.compile("^(https?://|www\\.)\\S+$")

  /** Score one token span of `text`. Returns None for NO_LABEL (below every
    * label's interest).
    */
  def score(text: String, span: Span): Option[Scored] = {
    val s = text.substring(span.start, span.end)
    val len = s.length
    if (len == 0) return None
    var digits = 0; var letters = 0; var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (Character.isDigit(c)) digits += 1 else if (Character.isLetter(c)) letters += 1
      i += 1
    }
    val digitFrac = digits.toDouble / len

    if (emailRe.matcher(s).matches())
      return Some(Scored(span, "email", sigmoid(4.0 + 0.05 * len), s.toLowerCase))
    if (urlRe.matcher(s).matches())
      return Some(Scored(span, "url", sigmoid(3.5 + 0.02 * len), s))

    if (s.indexOf('%') >= 0 && digits > 0) {
      Normalize.normalizeToPercentage(s) match {
        case Some(v) => return Some(Scored(span, "percent", sigmoid(2.5 + 2.0 * digitFrac - 0.3 * letters), v.toString))
        case None =>
      }
    }

    if (digits >= 4 || (digits >= 2 && (s.indexOf('.') >= 0 || s.indexOf('/') >= 0 || s.indexOf('-') >= 0))) {
      Normalize.normalizeToDate(s) match {
        case Some(iso) if digits >= 4 =>
          return Some(Scored(span, "date", sigmoid(1.8 + 0.4 * digits - 0.6 * letters), iso))
        case _ =>
      }
    }

    if (digits > 0 && (s.indexOf(',') >= 0 || s.indexOf('.') >= 0)) {
      Normalize.normalizeToFloat(s) match {
        case Some(v) =>
          // decimal-separated figure → amount
          return Some(Scored(span, "amount", sigmoid(1.2 + 2.5 * digitFrac - 0.8 * letters), v.toString))
        case None =>
      }
    }

    if (digits > 0 && letters == 0) {
      Normalize.normalizeToFloat(s) match {
        case Some(v) => return Some(Scored(span, "number", sigmoid(0.8 + 1.5 * digitFrac), v.toString))
        case None =>
      }
    }
    None
  }

  /** Score all spans; drop below-label-threshold results (F6 semantics:
    * threshold filter with per-label thresholds, broadcast map).
    */
  def scoreSpans(text: String, spans: Seq[Span]): Vector[Scored] =
    spans.iterator.flatMap(score(text, _))
      .filter(sc => sc.confidence >= Labels.byName(sc.label).threshold)
      .toVector

  /** Full feature vector for a span — exposed for the feature-stage query
    * surface (X1), same vector the logistic would consume when trained.
    */
  def featuresOf(text: String, span: Span): Array[Double] =
    Features.convertToFeat(text.substring(span.start, span.end))
}
