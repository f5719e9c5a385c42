package graft.engine

import graft.core.Geometry

/** S3 char-bbox ingestion: parse per-character bounding-box arrays (the
  * OCR payload) into validated [[Geometry.CharBox]] rows. Semantics follow
  * data.py:2097-2120 (`Document.bboxes`) and the `Bbox._valid` rules
  * (data.py:261-340):
  *
  *  - identity: the box's character must equal the document text at that
  *    offset, unless the box char is ' ', '\n' or '\f'
  *  - geometry: non-negative width/height (strict mode also rejects zero),
  *    non-negative coordinates, inside the page bounds
  *  - `page_number` arrives 1-based (bbox.json5 contract) and is stored
  *    0-based
  *
  * Pure per-document kernel — runs inside mapPartitions as a filter stage in
  * front of the geometry/feature operators; a corrupted payload fails the
  * document (Left), never poisons the partition.
  */
object Ingest {

  final case class CharBoxPayload(
      offsets: Array[Int],
      chars: String, // box-provided characters, parallel to offsets
      pageNumbers: Array[Int], // 1-based
      lineNumbers: Array[Int], // 1-based within page
      x0: Array[Double], x1: Array[Double],
      y0: Array[Double], y1: Array[Double])

  /** Validate and convert one document's payload. Left = first violation,
    * with the reference's error vocabulary. Boxed-view convenience over
    * [[validatedGrid]] — hot paths should take the grid directly.
    */
  def validatedCharBoxes(
      text: String,
      p: CharBoxPayload,
      pageWidth: Double = 612.0,
      pageHeight: Double = 792.0,
      strict: Boolean = false): Either[String, Vector[Geometry.CharBox]] =
    validatedGrid(text, p, pageWidth, pageHeight, strict).map(_.toCharBoxes)

  /** Columnar validation: the payload's primitive arrays flow THROUGH into
    * the returned [[Geometry.CharGrid]] (coordinate arrays and the char
    * string are shared, only the 1-based page numbers are copied to
    * 0-based) — no per-char objects anywhere in the validate→geometry path.
    */
  def validatedGrid(
      text: String,
      p: CharBoxPayload,
      pageWidth: Double = 612.0,
      pageHeight: Double = 792.0,
      strict: Boolean = false): Either[String, Geometry.CharGrid] = {
    val n = p.offsets.length
    if (p.chars.length != n || p.pageNumbers.length != n || p.lineNumbers.length != n ||
        p.x0.length != n || p.x1.length != n || p.y0.length != n || p.y1.length != n)
      return Left(s"ragged payload: $n offsets vs ${p.chars.length} chars")
    val pages0 = new Array[Int](n)
    var i = 0
    while (i < n) {
      val off = p.offsets(i)
      val boxChar = p.chars.charAt(i)
      if (off < 0 || off >= text.length)
        return Left(s"offset $off outside document text of length ${text.length}")
      val docChar = text.charAt(off)
      if (boxChar != ' ' && boxChar != '\f' && boxChar != '\n' && boxChar != docChar)
        return Left(s"""Bbox provides character "$boxChar" document text refers to "$docChar" at offset $off""")
      val bx0 = p.x0(i); val bx1 = p.x1(i); val by0 = p.y0(i); val by1 = p.y1(i)
      if (bx0 > bx1) return Left(s"bbox at offset $off has negative width")
      if (by0 > by1) return Left(s"bbox at offset $off has negative height")
      if (strict && bx0 == bx1) return Left(s"bbox at offset $off has no width")
      if (strict && by0 == by1) return Left(s"bbox at offset $off has no height")
      if (bx0 < 0 || by0 < 0) return Left(s"bbox at offset $off has negative coordinate")
      if (bx1 > pageWidth) return Left(s"bbox at offset $off exceeds page width")
      if (by1 > pageHeight) return Left(s"bbox at offset $off exceeds page height")
      if (p.pageNumbers(i) < 1) return Left(s"bbox at offset $off has non-positive page_number")
      if (p.lineNumbers(i) < 0) return Left(s"bbox at offset $off has negative line_number")
      pages0(i) = p.pageNumbers(i) - 1
      i += 1
    }
    // The reference keys boxes by character index in a dict (data.py:2100-
    // 2117): arbitrary serialization order is accepted and a duplicate
    // offset resolves last-write-wins. Mirror that — the grid's offset
    // order is an internal invariant, not an ingest contract.
    var ascending = true
    i = 1
    while (ascending && i < n) { if (p.offsets(i - 1) >= p.offsets(i)) ascending = false; i += 1 }
    if (ascending)
      Right(new Geometry.CharGrid(p.offsets, p.chars, pages0, p.lineNumbers,
        p.x0, p.x1, p.y0, p.y1))
    else {
      val idx = Array.tabulate(n)(identity)
        .sortBy(j => (p.offsets(j), j)) // stable: later entry wins on ties
      val keep = new Array[Boolean](n)
      var m = 0
      i = 0
      while (i < n) {
        val last = i == n - 1 || p.offsets(idx(i + 1)) != p.offsets(idx(i))
        if (last) { keep(i) = true; m += 1 }
        i += 1
      }
      val offs = new Array[Int](m); val sb = new java.lang.StringBuilder(m)
      val pg = new Array[Int](m); val ln = new Array[Int](m)
      val ax0 = new Array[Double](m); val ax1 = new Array[Double](m)
      val ay0 = new Array[Double](m); val ay1 = new Array[Double](m)
      var k = 0
      i = 0
      while (i < n) {
        if (keep(i)) {
          val j = idx(i)
          offs(k) = p.offsets(j); sb.append(p.chars.charAt(j))
          pg(k) = pages0(j); ln(k) = p.lineNumbers(j)
          ax0(k) = p.x0(j); ax1(k) = p.x1(j); ay0(k) = p.y0(j); ay1(k) = p.y1(j)
          k += 1
        }
        i += 1
      }
      Right(new Geometry.CharGrid(offs, sb.toString, pg, ln, ax0, ax1, ay0, ay1))
    }
  }

  /** Payload constructor from char boxes (round-trip helper for tests and
    * for staging synthetic OCR payloads through the real validation path).
    */
  def payloadOf(chars: Seq[Geometry.CharBox]): CharBoxPayload =
    CharBoxPayload(
      chars.map(_.offset).toArray,
      chars.map(_.ch).mkString,
      chars.map(_.page + 1).toArray,
      chars.map(_.line).toArray,
      chars.map(_.x0).toArray, chars.map(_.x1).toArray,
      chars.map(_.y0).toArray, chars.map(_.y1).toArray)

  /** Columnar payload constructor — shares the grid's arrays (only page
    * numbers are re-based to the payload's 1-based contract).
    */
  def payloadOf(g: Geometry.CharGrid): CharBoxPayload =
    CharBoxPayload(g.offsets, g.chars, g.pages.map(_ + 1), g.lines,
      g.x0, g.x1, g.y0, g.y1)
}
