package graft.core

/** Character-geometry kernels for the PDF/layout-aware path: bbox envelopes,
  * per-line grouping, merged-run construction, reading order. Semantics
  * follow konfuzio_sdk/utils.py:551-961 (get_bbox, group_bboxes_per_line,
  * get_merged_bboxes, select_bboxes) and data.py:962-989 (span bbox =
  * envelope of non-space char boxes). Coordinate origin is bottom-left
  * (reference docs/sdk/coordinates_system.md:31).
  */
object Geometry {

  /** One character's box. `page` is 0-based; `line` is 1-based like the
    * reference bbox.json5 `line_number`.
    */
  final case class CharBox(
      offset: Int, ch: Char, page: Int, line: Int,
      x0: Double, x1: Double, y0: Double, y1: Double)

  final case class Box(x0: Double, x1: Double, y0: Double, y1: Double, page: Int, line: Int) {
    def area: Double = (x1 - x0) * (y1 - y0)
    def quadrantTwoArea: Double = x0 * y0 // reference feature `area_quadrant_two`
  }

  /** Envelope of the non-space characters in [start, end) (data.py:977-988).
    * None when no char in range provides a box.
    */
  def spanBox(chars: IndexedSeq[CharBox], start: Int, end: Int): Option[Box] = {
    var x0 = Double.MaxValue; var y0 = Double.MaxValue
    var x1 = Double.MinValue; var y1 = Double.MinValue
    var page = -1; var line = -1; var sawMulti = false
    var found = false
    chars.foreach { cb =>
      if (cb.offset >= start && cb.offset < end && cb.ch != ' ') {
        found = true
        if (cb.x0 < x0) x0 = cb.x0
        if (cb.y0 < y0) y0 = cb.y0
        if (cb.x1 > x1) x1 = cb.x1
        if (cb.y1 > y1) y1 = cb.y1
        if (page < 0) page = cb.page
        if (line < 0) line = cb.line else if (line != cb.line) sawMulti = true
      }
    }
    if (!found) None
    else Some(Box(x0, x1, y0, y1, page, if (sawMulti) -1 else line))
  }

  /** Group char boxes into per-line envelopes (utils.py:551-611). */
  def lineBoxes(chars: Seq[CharBox]): Vector[Box] =
    chars.filter(_.ch != ' ').groupBy(cb => (cb.page, cb.line)).toVector
      .sortBy(_._1)
      .map { case ((page, line), cs) =>
        Box(cs.map(_.x0).min, cs.map(_.x1).max, cs.map(_.y0).min, cs.map(_.y1).max, page, line)
      }

  /** Merge consecutive char boxes within a line into word-run boxes; a new
    * run starts when the x-gap exceeds `maxGap` multiples of the mean char
    * width (the space-gap accounting of utils.py:773-961).
    */
  def mergedBoxes(chars: Seq[CharBox], maxGap: Double = 1.5): Vector[Box] = {
    val out = Vector.newBuilder[Box]
    chars.filter(_.ch != ' ').groupBy(cb => (cb.page, cb.line)).toVector.sortBy(_._1).foreach {
      case ((page, line), csUnsorted) =>
        val cs = csUnsorted.sortBy(_.x0)
        val meanW = math.max(1e-9, cs.map(c => c.x1 - c.x0).sum / cs.length)
        var runStart = 0
        var i = 1
        def flush(endIdx: Int): Unit = {
          val run = cs.slice(runStart, endIdx)
          out += Box(run.map(_.x0).min, run.map(_.x1).max, run.map(_.y0).min, run.map(_.y1).max, page, line)
        }
        while (i < cs.length) {
          if (cs(i).x0 - cs(i - 1).x1 > maxGap * meanW) { flush(i); runStart = i }
          i += 1
        }
        flush(cs.length)
    }
    out.result()
  }

  /** Chars fully inside a selection box on a page (information_extraction.py:157-193). */
  def selectChars(chars: Seq[CharBox], sel: Box): Seq[CharBox] =
    chars.filter(cb =>
      cb.page == sel.page && sel.x0 <= cb.x0 && cb.x1 <= sel.x1 && sel.y0 <= cb.y0 && cb.y1 <= sel.y1)

  /** Reading order: (page, line, x0) ascending — the offset-order contract. */
  def readingOrder(boxes: Seq[Box]): Vector[Box] =
    boxes.toVector.sortBy(b => (b.page, b.line, b.x0))

  /** X2 spatial features of a span box relative to its page
    * (data.py:1070-1088; information_extraction.py:1622-1625): absolutes,
    * area, quadrant-two area, page-relative ratios, and the span's relative
    * page position in the document.
    */
  final case class SpatialFeatures(
      x0: Double, x1: Double, y0: Double, y1: Double,
      area: Double, areaQuadrantTwo: Double,
      x0Rel: Double, x1Rel: Double, y0Rel: Double, y1Rel: Double,
      pageIndex: Int, relativePositionInPage: Double)

  def spatialFeatures(b: Box, pageW: Double, pageH: Double, nPages: Int): SpatialFeatures =
    SpatialFeatures(b.x0, b.x1, b.y0, b.y1, b.area, b.quadrantTwoArea,
      b.x0 / pageW, b.x1 / pageW, b.y0 / pageH, b.y1 / pageH,
      b.page, if (nPages > 0) b.page.toDouble / nPages else 0.0)

  /** Rescale a box between coordinate spaces (utils.py:502-524). */
  def rescale(b: Box, fromW: Double, fromH: Double, toW: Double, toH: Double): Box =
    b.copy(x0 = b.x0 * toW / fromW, x1 = b.x1 * toW / fromW,
      y0 = b.y0 * toH / fromH, y1 = b.y1 * toH / fromH)

  /** Synthesize char boxes for plain text on a fixed-metric grid — gives the
    * layout kernels a deterministic geometry for text-only documents
    * (each char 6x10 units, lines stacked top-down, origin bottom-left).
    */
  def syntheticCharBoxes(text: String, pageW: Double = 612, pageH: Double = 792): Vector[CharBox] = {
    val out = Vector.newBuilder[CharBox]
    var page = 0; var line1 = 1; var col = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\n') { line1 += 1; col = 0 }
      else if (c == '\f') { page += 1; line1 = 1; col = 0 }
      else {
        val x0 = col * 6.0
        val yTop = pageH - (line1 - 1) * 12.0
        out += CharBox(i, c, page, line1, x0, x0 + 6.0, yTop - 10.0, yTop)
        col += 1
      }
      i += 1
    }
    out.result()
  }
}
