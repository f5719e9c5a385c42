package graft.engine

import graft.core.{Features, Geometry, Span}
import org.apache.spark.sql.Dataset

/** X8 feature orchestration: the assembled per-span feature frame — the
  * reference's central training/inference data product
  * (information_extraction.py:1345-1647 `process_document_data`). For each
  * span the frame holds, in load-bearing column order:
  *
  *   - 51 string features of the span text (X1, `convert_to_feat`)
  *   - 6 absolute spatial features x0,y0,x1,y1,page_index,area_quadrant_two
  *     (X2; information_extraction.py:1624, data.py:1070-1081)
  *   - nLeft + nRight neighbor x-distances `l_dist*`/`r_dist*` (X4; plus
  *     `l_pos*`/`r_pos*` when the cross-line variant is on,
  *     information_extraction.py:1377-1380)
  *   - 51 string features per neighbor (X5, prefixes l0_, l1_, r0_, ...)
  *   - relative_position_in_page (page_index / n_pages)
  *   - the first word's box first_word_x0,y0,x1,y1 (X3;
  *     information_extraction.py:1640-1645 — only the box coordinates enter
  *     the feature list; the first-word string features are computed by the
  *     reference but never appended to it)
  *
  * Width contract (tests/trainer/test_information_extraction.py:296-299,
  * 345-351): 270 columns at n_nearest=2, 1102 at n_nearest=10,
  * featureNames(42) == "feat_substring_count_h", last == "first_word_y1".
  *
  * The kernel is pure per-document Scala and runs inside `mapPartitions` —
  * the frame for 10^12 spans is one narrow shuffle-free pass.
  */
object FeatureFrame {

  val PadDistance = 100000.0

  /** The ordered feature-name contract of the assembled frame. Optional
    * blocks follow the reference's feature_list order (information_
    * extraction.py:1608-1637): word-on-page indicators sit between the
    * relative-position feature and the first-word box; catchphrase
    * distances come last.
    */
  def featureNames(
      nLeft: Int = 2, nRight: Int = 2,
      firstWord: Boolean = true, acrossLines: Boolean = false,
      substringFeatures: Seq[String] = Nil,
      catchphrases: Seq[String] = Nil): Vector[String] = {
    val base = Features.featureNames
    val lKeys = (0 until nLeft).map(i => s"l_dist$i") ++
      (if (acrossLines) (0 until nLeft).map(i => s"l_pos$i") else Seq.empty)
    val rKeys = (0 until nRight).map(i => s"r_dist$i") ++
      (if (acrossLines) (0 until nRight).map(i => s"r_pos$i") else Seq.empty)
    val relStrings = (0 until nLeft).flatMap(i => base.map(n => s"l${i}_$n")) ++
      (0 until nRight).flatMap(i => base.map(n => s"r${i}_$n"))
    base ++
      Vector("x0", "y0", "x1", "y1", "page_index", "area_quadrant_two") ++
      lKeys ++ rKeys ++ relStrings ++
      Vector("relative_position_in_page") ++
      substringFeatures.indices.map(i => s"word_on_page_feat$i") ++
      (if (firstWord) Vector("first_word_x0", "first_word_y0", "first_word_x1", "first_word_y1")
       else Vector.empty) ++
      catchphrases.map(c => s"catchphrase_dist_$c")
  }

  def width(nLeft: Int = 2, nRight: Int = 2,
      firstWord: Boolean = true, acrossLines: Boolean = false,
      substringFeatures: Seq[String] = Nil, catchphrases: Seq[String] = Nil): Int =
    featureNames(nLeft, nRight, firstWord, acrossLines, substringFeatures, catchphrases).length

  final case class Row(start: Int, end: Int, offsetString: String, features: Array[Double])

  private final case class Neighbor(dist: Double, pos: Int, candIdx: Int)
  private val Pad = Neighbor(PadDistance, 0, -1)
  private val padFeat: Array[Double] = Features.convertToFeat("")

  /** Assemble the frame for one document. `candidates` are the line-token
    * spans (the reference re-tokenizes each span's line; passing the
    * document's whitespace tokens is equivalent for whitespace pipelines),
    * `targets` the spans to featurize — both sorted by start. Targets whose
    * interval holds no boxed (non-space) character are skipped, mirroring
    * the reference's page_index-is-None row drop
    * (information_extraction.py:1594-1596).
    */
  def assembleDoc(
      text: String,
      chars: IndexedSeq[Geometry.CharBox],
      candidates: IndexedSeq[Span],
      targets: IndexedSeq[Span],
      nLeft: Int = 2, nRight: Int = 2,
      firstWord: Boolean = true,
      acrossLines: Boolean = false,
      substringFeatures: Seq[String] = Nil,
      catchphrases: Seq[String] = Nil): Vector[Row] =
    assembleDoc(text, Geometry.CharGrid.fromCharBoxes(chars), candidates, targets,
      nLeft, nRight, firstWord, acrossLines, substringFeatures, catchphrases)

  /** Columnar assembly — the hot path: all geometry reads go straight to
    * the grid's primitive arrays (no per-char objects).
    */
  def assembleDoc(
      text: String,
      g: Geometry.CharGrid,
      candidates: IndexedSeq[Span],
      targets: IndexedSeq[Span],
      nLeft: Int, nRight: Int,
      firstWord: Boolean,
      acrossLines: Boolean,
      substringFeatures: Seq[String],
      catchphrases: Seq[String]): Vector[Row] = {
    if (text.isEmpty || targets.isEmpty) return Vector.empty

    // O(1) grid-row lookup by offset (grid rows skip \n/\f, so row != offset)
    val byOff = new Array[Int](text.length)
    java.util.Arrays.fill(byOff, -1)
    var gi = 0
    while (gi < g.length) {
      if (g.offsets(gi) < text.length) byOff(g.offsets(gi)) = gi
      gi += 1
    }

    def boxOf(sp: Span): Geometry.Box = {
      var x0 = Double.MaxValue; var y0 = Double.MaxValue
      var x1 = Double.MinValue; var y1 = Double.MinValue
      var page = -1; var found = false
      var i = sp.start
      val lim = math.min(sp.end, text.length)
      while (i < lim) {
        val j = byOff(i)
        if (j >= 0 && g.chars.charAt(j) != ' ') {
          found = true
          if (g.x0(j) < x0) x0 = g.x0(j)
          if (g.y0(j) < y0) y0 = g.y0(j)
          if (g.x1(j) > x1) x1 = g.x1(j)
          if (g.y1(j) > y1) y1 = g.y1(j)
          if (page < 0) page = g.pages(j)
        }
        i += 1
      }
      if (found) Geometry.Box(x0, x1, y0, y1, page, -1) else null
    }

    // lines: \f counts as a line break too (text.replace('\f','\n').split('\n'))
    val lines = {
      val out = Vector.newBuilder[Span]
      var s = 0; var i = 0
      while (i <= text.length) {
        if (i == text.length || text.charAt(i) == '\n' || text.charAt(i) == '\f') {
          out += Span(s, i); s = i + 1
        }
        i += 1
      }
      out.result()
    }
    val nPages = text.count(_ == '\f') + 1

    // the reference picks the first line overlapping the span, which for
    // contiguous lines is the line containing span.start — binary search
    // over the sorted line starts (O(tokens x lines) indexWhere would
    // dominate on book-sized documents)
    def lineOfSpan(sp: Span): Int = {
      var lo = 0; var hi = lines.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (lines(mid).start <= sp.start) lo = mid else hi = mid - 1
      }
      lo
    }

    // candidates grouped per line, each with its box (computed once)
    val candBox = candidates.map(boxOf)
    val candLine = candidates.map(lineOfSpan)
    val byLine: Map[Int, Vector[Int]] =
      candidates.indices.toVector.groupBy(candLine).withDefaultValue(Vector.empty)

    val firstBox: Geometry.Box =
      candidates.indices.iterator.map(candBox).find(_ != null).orNull

    // X7 word-on-page: page texts split on \f (substring_on_page,
    // information_extraction.py:1650-1659)
    val pageTexts: Array[String] =
      if (substringFeatures.isEmpty) Array.empty else text.split('\f')
    // X6 catchphrases: line texts in the \f->\n flattened view
    val lineTexts: IndexedSeq[String] =
      if (catchphrases.isEmpty) IndexedSeq.empty
      else lines.map(l => text.substring(l.start, l.end))

    val base = Features.featureNames.length
    val w = width(nLeft, nRight, firstWord, acrossLines, substringFeatures, catchphrases)

    val candIdxBySpan = new java.util.HashMap[Long, Int](candidates.length * 2)
    candidates.indices.foreach { ci =>
      val c = candidates(ci)
      candIdxBySpan.put((c.start.toLong << 32) | c.end.toLong, ci)
    }
    def candIndexOf(sp: Span): Int =
      candIdxBySpan.getOrDefault((sp.start.toLong << 32) | sp.end.toLong, -1)

    // memoized candidate string features: each token is its own target plus
    // a neighbor of ~2(nLeft+nRight) others — compute its 51-vector once
    val candFeatCache = new Array[Array[Double]](candidates.length)
    def featOfCand(ci: Int): Array[Double] = {
      if (ci < 0) return padFeat
      var f = candFeatCache(ci)
      if (f == null) {
        val c = candidates(ci)
        f = Features.convertToFeat(text.substring(c.start, c.end))
        candFeatCache(ci) = f
      }
      f
    }

    // Same-line neighbor search. A line whose candidates are monotone
    // (offset order == x order, the universal case for tokenized text and
    // reading-ordered OCR) resolves each target's nLeft/nRight nearest
    // neighbors by binary search + a bounded walk — O(n·(log n + k)) per
    // line instead of the O(n²) full scan with per-pair allocations that
    // made book-length single-line documents quadratic. Non-monotone lines
    // keep the exact full scan.
    // The binary searches below assume start AND end offsets non-decreasing
    // over ALL of the line's candidates (null-box ones participate in the
    // search even though the walks skip them), and x order non-decreasing
    // over the boxed ones. Check exactly that; default true so a target on
    // a candidate-less line falls through to empty searches (Pad neighbors)
    // instead of a NoSuchElementException.
    val lineMonotone: Map[Int, Boolean] = byLine.map { case (ln, cis) =>
      var mono = true
      var prevStart = Int.MinValue
      var prevEnd = Int.MinValue
      var prevX0 = Double.NegativeInfinity
      var prevX1 = Double.NegativeInfinity
      cis.foreach { ci =>
        val c = candidates(ci); val cb = candBox(ci)
        if (c.start < prevStart || c.end < prevEnd) mono = false
        prevStart = c.start; prevEnd = c.end
        if (cb != null) {
          if (cb.x0 < prevX0 || cb.x1 < prevX1) mono = false
          prevX0 = cb.x0; prevX1 = cb.x1
        }
      }
      ln -> mono
    }.withDefaultValue(true)

    val out = Vector.newBuilder[Row]
    targets.foreach { span =>
      // on the standard self-featurize path (targets == candidates) the
      // box is already in candBox — avoid a second envelope scan per target
      val tBox = {
        val ti = candIndexOf(span)
        if (ti >= 0) candBox(ti) else boxOf(span)
      }
      if (tBox != null) {
        val lineNum = lineOfSpan(span)
        // same-line neighbors: left = candidates ending at-or-before the span
        // start, distance is the bbox x-gap (information_extraction.py:1494-1503);
        // nsmallest(dist) == largest x1 left of the span / smallest x0 right
        val lineCands = byLine(lineNum)
        var lFinal = Vector.empty[Neighbor]
        var rFinal = Vector.empty[Neighbor]
        if (lineMonotone(lineNum)) {
          // first index with candidate end > span.start (ends non-decreasing)
          var lo = 0; var hi = lineCands.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (candidates(lineCands(mid)).end <= span.start) lo = mid + 1 else hi = mid
          }
          val lB = Vector.newBuilder[Neighbor]
          var i = lo - 1
          var taken = 0
          while (i >= 0 && taken < nLeft) {
            val ci = lineCands(i); val cb = candBox(ci)
            if (cb != null) { lB += Neighbor(tBox.x0 - cb.x1, 0, ci); taken += 1 }
            i -= 1
          }
          lFinal = lB.result()
          // first index with candidate start >= span.end (starts non-decreasing)
          lo = 0; hi = lineCands.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (candidates(lineCands(mid)).start < span.end) lo = mid + 1 else hi = mid
          }
          val rB = Vector.newBuilder[Neighbor]
          i = lo
          taken = 0
          while (i < lineCands.length && taken < nRight) {
            val ci = lineCands(i); val cb = candBox(ci)
            if (cb != null) { rB += Neighbor(cb.x0 - tBox.x1, 0, ci); taken += 1 }
            i += 1
          }
          rFinal = rB.result()
        } else {
          var lList = List.empty[Neighbor]
          var rList = List.empty[Neighbor]
          lineCands.foreach { ci =>
            val c = candidates(ci); val cb = candBox(ci)
            if (cb != null) {
              if (c.end <= span.start) lList ::= Neighbor(tBox.x0 - cb.x1, 0, ci)
              else if (c.start >= span.end) rList ::= Neighbor(cb.x0 - tBox.x1, 0, ci)
            }
          }
          lFinal = lList.sortBy(_.dist).take(nLeft).toVector
          rFinal = rList.sortBy(_.dist).take(nRight).toVector
        }
        if (acrossLines) {
          // probe previous/next lines until enough candidates accumulate
          // (information_extraction.py:1506-1543); dist = min coordinate gap
          def probe(step: Int, need: Int): Vector[Neighbor] = {
            val acc = Vector.newBuilder[Neighbor]
            var n = 0
            var i = 1
            var ln = lineNum + step
            while (ln >= 0 && ln < lines.length && n < need) {
              byLine(ln).foreach { ci =>
                val cb = candBox(ci)
                if (cb != null) {
                  // allocation-free min over the four corner gaps
                  val d = math.min(
                    math.min(math.abs(tBox.x0 - cb.x0), math.abs(tBox.x0 - cb.x1)),
                    math.min(math.abs(tBox.x1 - cb.x0), math.abs(tBox.x1 - cb.x1)))
                  acc += Neighbor(d, i * step, ci)
                  n += 1
                }
              }
              i += 1
              ln += step
            }
            acc.result()
          }
          // the reference appends the WHOLE prev-line accumulation reversed
          // (prev_line_candidates[::-1], py:1533) after the same-line
          // nsmallest, then truncates — a multi-line probe therefore leads
          // with the FARTHEST probed line's candidates, and the right probe
          // is deliberately not reversed (py:1534). Quirk replicated as-is.
          lFinal = (lFinal ++ probe(-1, nLeft - lFinal.length).reverse).take(nLeft)
          rFinal = (rFinal ++ probe(+1, nRight - rFinal.length)).take(nRight)
        }
        lFinal = lFinal.padTo(nLeft, Pad)
        rFinal = rFinal.padTo(nRight, Pad)

        val f = new Array[Double](w)
        var k = 0
        def put(v: Double): Unit = { f(k) = v; k += 1 }
        val s = text.substring(span.start, math.min(span.end, text.length))
        val targetIdx = candIndexOf(span)
        (if (targetIdx >= 0) featOfCand(targetIdx) else Features.convertToFeat(s)).foreach(put)
        put(tBox.x0); put(tBox.y0); put(tBox.x1); put(tBox.y1)
        put(tBox.page); put(tBox.quadrantTwoArea)
        lFinal.foreach(nb => put(nb.dist))
        if (acrossLines) lFinal.foreach(nb => put(nb.pos))
        rFinal.foreach(nb => put(nb.dist))
        if (acrossLines) rFinal.foreach(nb => put(nb.pos))
        lFinal.foreach(nb => featOfCand(nb.candIdx).foreach(put))
        rFinal.foreach(nb => featOfCand(nb.candIdx).foreach(put))
        put(tBox.page.toDouble / nPages)
        substringFeatures.foreach { word =>
          val pageText = if (tBox.page < pageTexts.length) pageTexts(tBox.page) else ""
          put(Features.wordOnPage(pageText, word))
        }
        if (firstWord && firstBox != null) {
          put(firstBox.x0); put(firstBox.y0); put(firstBox.x1); put(firstBox.y1)
        } else if (firstWord) {
          put(0); put(0); put(0); put(0)
        }
        if (catchphrases.nonEmpty) {
          Features.catchphraseDistances(lineTexts, lineNum, catchphrases).foreach(d => put(d))
        }
        assert(k == w, s"assembled $k features, contract says $w")
        out += Row(span.start, span.end, s, f)
      }
    }
    out.result()
  }

  final case class SpanFrameRow(
      url: String, start: Int, end: Int, offset_string: String, features: Array[Double])

  /** The frame over extraction output: every token span featurized against
    * the document's token candidates on the synthetic char grid (real PDF
    * boxes plug in through the same [[Geometry.CharBox]] shape — see
    * [[Ingest.charBoxes]]). One narrow mapPartitions, zero shuffle.
    */
  def forDocs(ds: Dataset[ExtractedDoc], nLeft: Int = 2, nRight: Int = 2): Dataset[SpanFrameRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { doc =>
      val text = doc.extracted_text
      val cands: IndexedSeq[Span] = doc.spans.map(s => Span(s.start, s.end)).toIndexedSeq
      assembleDoc(text, Geometry.syntheticGrid(text), cands, cands, nLeft, nRight,
        firstWord = true, acrossLines = false, Nil, Nil)
        .map(r => SpanFrameRow(doc.url, r.start, r.end, r.offsetString, r.features))
    })
  }
}
