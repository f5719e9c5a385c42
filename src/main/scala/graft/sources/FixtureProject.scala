package graft.sources

import graft.engine.{Ingest, LabelDef, MiniJson}

/** S1/S2 offline-project source: load the reference's frozen fixture corpus
  * (an offline Project folder — labels.json5, documents/<id>/{document.txt,
  * annotations.json5, bbox.zip, pages.json5}) the way `Project(id_=None,
  * project_folder=...)` does in the reference (data.py:370-540). The data is
  * read IN PLACE, read-only; nothing is copied into this repo.
  *
  * This is the input surface of the composed train→extract golden
  * (tests/trainer/test_information_extraction.py:78-186): label metadata
  * feeds the scorer's class list and threshold/data-type dictionaries,
  * per-span annotations feed containment labeling, and the real per-char
  * OCR boxes feed the spatial features through the same S3 validation stage
  * as any production payload.
  */
object FixtureProject {

  /** One annotation SPAN (the reference's Span: an Annotation holds 1+
    * spans, each with its own offsets — multiline annotations split here).
    */
  final case class FixtureSpan(
      annId: Long, label: String, start: Int, end: Int,
      isCorrect: Boolean, revised: Boolean)

  final case class FixtureDoc(
      id: Long,
      text: String,
      spans: Vector[FixtureSpan],
      payload: Ingest.CharBoxPayload,
      pageWidth: Double,
      pageHeight: Double)

  import MiniJson._

  private def readFile(path: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)

  def available(root: String): Boolean =
    new java.io.File(s"$root/labels.json5").isFile

  /** Label metadata: name → (data type, threshold, multiple-top flag). */
  def labels(root: String): Vector[LabelDef] =
    arr(parse(readFile(s"$root/labels.json5"))).map { v =>
      val m = obj(v)
      LabelDef(
        name = str(m("text")),
        dataType = str(m("get_data_type_display")),
        threshold = m.get("threshold").map(num).filterNot(_.isNaN).getOrElse(0.1),
        hasMultipleTopCandidates = m.get("has_multiple_top_candidates")
          .exists { case JBool(b) => b; case _ => false })
    }

  /** Per-char OCR payload from the document's bbox.zip, in offset order —
    * the exact shape [[Ingest.validatedCharBoxes]] ingests.
    */
  def charBoxPayload(dir: String): Ingest.CharBoxPayload = {
    val zf = new java.util.zip.ZipFile(s"$dir/bbox.zip")
    val bbox =
      try {
        val entry = zf.getEntry("bbox.json5")
        // explicit context beats the NPE getInputStream(null) would throw
        require(entry != null, s"$dir/bbox.zip has no bbox.json5 entry")
        obj(parse(new String(zf.getInputStream(entry).readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)))
      } finally zf.close()
    val rows = bbox.toVector.map { case (k, v) => (k.toInt, obj(v)) }.sortBy(_._1)
    Ingest.CharBoxPayload(
      offsets = rows.map(_._1).toArray,
      // an empty box "text" (an OCR blank) maps to a space — exempt from
      // the char-identity rule, instead of StringIndexOutOfBounds
      chars = rows.map(r => str(r._2("text")).headOption.getOrElse(' ')).mkString,
      pageNumbers = rows.map(r => int(r._2("page_number"))).toArray,
      lineNumbers = rows.map(r => int(r._2("line_number"))).toArray,
      x0 = rows.map(r => num(r._2("x0"))).toArray,
      x1 = rows.map(r => num(r._2("x1"))).toArray,
      y0 = rows.map(r => num(r._2("y0"))).toArray,
      y1 = rows.map(r => num(r._2("y1"))).toArray)
  }

  /** Load one fixture document: text, flat annotation spans (one row per
    * span of every annotation, like `document.spans(use_correct=False)`),
    * char-box payload, and the page bounds from pages.json5 original_size.
    */
  def loadDoc(root: String, id: String): FixtureDoc = {
    val dir = s"$root/documents/$id"
    val text = readFile(s"$dir/document.txt")
    val anns = arr(parse(readFile(s"$dir/annotations.json5")))
    val spans = anns.flatMap { annV =>
      val a = obj(annV)
      val label = str(a("label_text"))
      val isCorrect = a("is_correct") match { case JBool(b) => b; case _ => false }
      val revised = a("revised") match { case JBool(b) => b; case _ => false }
      val annId = num(a("id")).toLong
      arr(a("bboxes")).map { sbV =>
        val sb = obj(sbV)
        FixtureSpan(annId, label, int(sb("start_offset")), int(sb("end_offset")),
          isCorrect, revised)
      }
    }.sortBy(s => (s.start, s.end))
    val pages = arr(parse(readFile(s"$dir/pages.json5"))).map(obj)
    val sizes = pages.map(p => arr(p("original_size")).map(num))
    val pageW = if (sizes.isEmpty) 612.0 else sizes.map(_(0)).max
    val pageH = if (sizes.isEmpty) 792.0 else sizes.map(_(1)).max
    FixtureDoc(id.toLong, text, spans, charBoxPayload(dir), pageW, pageH)
  }
}
