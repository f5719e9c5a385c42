package graft.engine

import graft.core.{Geometry, Normalize, Span}

/** Horizontal/vertical extraction merging (M1-M4). Semantics mirror
  * konfuzio_sdk/trainer/information_extraction.py:196-473:
  * run-merge adjacent same-label extractions when the gap is ≤5 chars of
  * spaces on the same line, with data-type-preserving rules (Text always,
  * Number never, Date/Percentage only when the merged slice still
  * normalizes); merged confidence is the buffer mean; text is the raw doc
  * slice. Pure per-document sequential kernel — runs inside mapPartitions,
  * zero shuffle.
  */
object Merge {

  val MaxOffsetDistance = 5

  private def gapIsSpaces(text: String, from: Int, to: Int): Boolean = {
    if (to - from > MaxOffsetDistance) return false
    var i = from
    while (i < to) {
      if (text.charAt(i) != ' ') return false
      i += 1
    }
    true
  }

  private def sameLine(text: String, start: Int, end: Int): Boolean = {
    var i = start
    while (i < end) {
      if (text.charAt(i) == '\n') return false
      i += 1
    }
    true
  }

  /** is_valid_merge (information_extraction.py:239-328) for a buffer ending
    * at `bufEnd` (buffer start `bufStart`) and candidate `row`.
    */
  private[engine] def isValidMerge(
      text: String, bufStart: Int, bufEnd: Int, row: Scorer.Scored, dataType: String, threshold: Double): Boolean = {
    if (row.confidence < threshold) return false
    if (!gapIsSpaces(text, bufEnd, row.span.start)) return false
    if (row.span.start - bufEnd > MaxOffsetDistance) return false
    if (!sameLine(text, math.min(bufStart, row.span.start), math.max(bufEnd, row.span.end))) return false
    dataType match {
      case "Number" | "Positive Number" => false
      case "Percentage" => Normalize.normalizeToPercentage(text.substring(bufStart, row.span.end)).isDefined
      case "Date" => Normalize.normalizeToDate(text.substring(bufStart, row.span.end)).isDefined
      case _ => true // Text & everything else merges freely
    }
  }

  /** merge_df horizontal (information_extraction.py:421-473): sequential
    * buffer scan per (document, label); rows must arrive sorted by start.
    * Label data types resolve through the engine's built-in registry.
    */
  def mergeHorizontal(text: String, rowsIn: Seq[Scorer.Scored], threshold: Double = 0.0): Vector[Scorer.Scored] =
    mergeHorizontal(text, rowsIn, threshold,
      label => Labels.byName.get(label).map(_.dataType).getOrElse("Text"))

  /** As above with an explicit label→data-type resolver (the reference's
    * `label_type_dict` parameter) — used when the label vocabulary comes
    * from a loaded project rather than the built-in registry.
    */
  def mergeHorizontal(text: String, rowsIn: Seq[Scorer.Scored], threshold: Double,
      dataTypeOf: String => String): Vector[Scorer.Scored] = {
    val out = Vector.newBuilder[Scorer.Scored]
    rowsIn.groupBy(_.label).toVector.sortBy(_._1).foreach { case (label, group) =>
      val dataType = dataTypeOf(label)
      // below-threshold rows are DROPPED from the output, not just from
      // merging — reference parity: merge_df's row loop does `continue`
      // on Accuracy < threshold (information_extraction.py:454-455). The
      // merged end comes from the buffer's LAST row even when an earlier
      // member extends further (flush_buffer's buffer[-1]['End'],
      // information_extraction.py:219-221) — also kept as-is.
      val rows = group.sortBy(r => (r.span.start, r.span.end)).filter(_.confidence >= threshold)
      var buffer = List.empty[Scorer.Scored] // reversed
      def flush(): Unit = if (buffer.nonEmpty) {
        val buf = buffer.reverse
        val start = buf.head.span.start
        val end = buf.last.span.end
        val conf = buf.map(_.confidence).sum / buf.size
        val slice = text.substring(start, end)
        val normalized = dataType match {
          case "Percentage" => Normalize.normalizeToPercentage(slice).map(_.toString).getOrElse(buf.head.normalized)
          case "Date" => Normalize.normalizeToDate(slice).getOrElse(buf.head.normalized)
          case _ => if (buf.size == 1) buf.head.normalized else slice
        }
        out += Scorer.Scored(Span(start, end), label, conf, normalized)
        buffer = Nil
      }
      rows.foreach { row =>
        buffer match {
          case head :: _ if isValidMerge(text, buffer.last.span.start, head.span.end, row, dataType, threshold) =>
            buffer = row :: buffer
          case Nil => buffer = row :: Nil
          case _ => flush(); buffer = row :: Nil
        }
      }
      flush()
    }
    out.result().sortBy(r => (r.span.start, r.span.end, r.label))
  }

  /** M5 `split_multiline_annotations` (information_extraction.py:620-667):
    * explode a multi-line extraction into one row per line segment.
    */
  def splitMultiline(text: String, row: Scorer.Scored): Vector[Scorer.Scored] =
    graft.core.TextOffsets.splitAtLineBreaks(text, row.span.start, row.span.end)
      .map(sp => row.copy(span = sp, normalized = text.substring(sp.start, sp.end)))

  /** Vertical merge (M4, information_extraction.py:331-418) for
    * multiline-capable labels: merge rows whose line boxes overlap in x and
    * whose union box contains no foreign non-space characters. Uses the
    * char-box array (real for PDF inputs, synthetic grid for plain text).
    */
  def mergeVertical(
      text: String,
      chars: IndexedSeq[Geometry.CharBox],
      rowsIn: Seq[Scorer.Scored]): Vector[(Scorer.Scored, Vector[Span])] =
    mergeVertical(text, Geometry.CharGrid.fromCharBoxes(chars), rowsIn)

  /** Columnar vertical merge: span boxes via binary-searched range scans,
    * containment probes bounded to the line runs inside the union box —
    * no per-(page,line) hash maps, no per-char objects.
    */
  def mergeVertical(
      text: String,
      g: Geometry.CharGrid,
      rowsIn: Seq[Scorer.Scored]): Vector[(Scorer.Scored, Vector[Span])] = {
    // memoized: the group sort evaluates a box per row and validVertical
    // re-reads every buffer member's box per candidate — without the cache
    // that is O(n²) spanBox scans per (doc,label) group
    val boxCache = scala.collection.mutable.HashMap.empty[Span, Option[Geometry.Box]]
    def boxOf(sp: Span): Option[Geometry.Box] =
      boxCache.getOrElseUpdate(sp,
        Geometry.spanBox(g, sp.start, math.min(sp.end, text.length)))
    // per-line-run y-envelopes for bounded containment probes
    val rs = g.runStarts
    val nRuns = rs.length - 1
    val runY0 = new Array[Double](nRuns)
    val runY1 = new Array[Double](nRuns)
    var r = 0
    while (r < nRuns) {
      var ly0 = Double.MaxValue; var ly1 = Double.MinValue
      var i = rs(r)
      while (i < rs(r + 1)) {
        val j = g.order(i)
        if (g.y0(j) < ly0) ly0 = g.y0(j)
        if (g.y1(j) > ly1) ly1 = g.y1(j)
        i += 1
      }
      runY0(r) = ly0; runY1(r) = ly1
      r += 1
    }
    /** grid row indices fully inside `sel` on its page */
    def charsInBox(sel: Geometry.Box): Iterator[Int] =
      (0 until nRuns).iterator.flatMap { r =>
        val j0 = g.order(rs(r))
        if (g.pages(j0) != sel.page || runY1(r) < sel.y0 || runY0(r) > sel.y1) Iterator.empty
        else (rs(r) until rs(r + 1)).iterator.map(g.order).filter(j =>
          sel.x0 <= g.x0(j) && g.x1(j) <= sel.x1 && sel.y0 <= g.y0(j) && g.y1(j) <= sel.y1)
      }

    val out = Vector.newBuilder[(Scorer.Scored, Vector[Span])]
    rowsIn.groupBy(_.label).toVector.sortBy(_._1).foreach { case (label, group) =>
      val rows = group.toVector.sortBy(r => boxOf(r.span).map(-_.y0).getOrElse(0.0))
      var buffer = Vector.empty[Scorer.Scored]
      def flush(): Unit = if (buffer.nonEmpty) {
        if (buffer.size == 1) {
          // a row that merged with nothing passes through untouched
          // (normalized value and confidence preserved)
          out += ((buffer.head, Vector(buffer.head.span)))
        } else {
          val sorted = buffer.sortBy(_.span.start)
          val conf = buffer.map(_.confidence).sum / buffer.size
          val mergedText = sorted.map(r => text.substring(r.span.start, r.span.end)).mkString("\n")
          out += ((Scorer.Scored(Span(sorted.head.span.start, sorted.last.span.end), label, conf, mergedText),
            sorted.map(_.span)))
        }
        buffer = Vector.empty
      }
      def validVertical(row: Scorer.Scored): Boolean = {
        val bufBoxes = buffer.flatMap(r => boxOf(r.span))
        val rowBox = boxOf(row.span)
        if (bufBoxes.isEmpty || rowBox.isEmpty) return false
        val bb = bufBoxes
        val bx0 = bb.map(_.x0).min; val bx1 = bb.map(_.x1).max
        val by0 = bb.map(_.y0).min; val by1 = bb.map(_.y1).max
        val r = rowBox.get
        val overlap = (bx1 >= r.x0 && r.x0 >= bx0) || (bx1 >= r.x1 && r.x1 >= bx0) || (bx0 >= r.x0 && r.x1 >= bx1)
        if (!overlap) return false
        if (bb.exists(_.page != r.page)) return false
        // union box must not contain foreign non-space chars; membership is
        // checked against member [start, end] intervals INCLUSIVE of end —
        // the reference builds member bboxes with range(Start, End + 1)
        // (information_extraction.py:398), deliberately tolerating a
        // non-space char exactly at a member's end offset
        val ux0 = math.min(bx0, r.x0); val ux1 = math.max(bx1, r.x1)
        val uy0 = math.min(by0, r.y0); val uy1 = math.max(by1, r.y1)
        val members = buffer :+ row
        def inMember(off: Int): Boolean = {
          var i = 0
          while (i < members.length) {
            val sp = members(i).span
            if (off >= sp.start && off <= sp.end) return true
            i += 1
          }
          false
        }
        charsInBox(Geometry.Box(ux0, ux1, uy0, uy1, r.page, -1))
          .forall(j => g.chars.charAt(j) == ' ' || inMember(g.offsets(j)))
      }
      rows.foreach { row =>
        if (buffer.nonEmpty && validVertical(row)) buffer :+= row
        else { flush(); buffer = Vector(row) }
      }
      flush()
    }
    out.result()
  }
}
