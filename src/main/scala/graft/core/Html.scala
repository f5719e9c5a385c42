package graft.core

import scala.collection.mutable

/** Jsoup-free streaming HTML boilerplate stripper.
  *
  * A single-pass tag tokenizer segments the page into text blocks at
  * block-level tag boundaries, tracking per-block link-character counts and
  * source offsets. Blocks are then classified content vs boilerplate with
  * text-density / link-density heuristics in the spirit of Boilerpipe
  * (Kohlschütter et al., WSDM'10) and trafilatura — built from scratch for
  * this engine; the reference SDK ingests OCR output and has no HTML stage.
  *
  * Output contract: `extract(html).text` is a pure function of the input
  * bytes — byte-identical across runs, partitionings and parallelism levels
  * (the engine's per-url invariant). Block provenance spans point back into
  * the raw HTML source so downstream span math stays char-exact.
  */
object Html {

  /** One text block with provenance. `srcStart/srcEnd` delimit the HTML
    * source region the block text came from; `linkChars` counts characters
    * inside `<a>` elements; `headingLevel` is 1-6 for h1-h6 else 0.
    */
  final case class Block(
      text: String,
      linkChars: Int,
      headingLevel: Int,
      inList: Boolean,
      srcStart: Int,
      srcEnd: Int,
  ) {
    def words: Int = { var n = 0; var in = false; var i = 0
      while (i < text.length) { val ws = text.charAt(i) == ' '
        if (!ws && !in) { n += 1; in = true } else if (ws) in = false
        i += 1 }
      n
    }
    def linkDensity: Double = if (text.isEmpty) 0.0 else linkChars.toDouble / text.length
  }

  /** Extraction result: main text, per-block spans into `text`, and
    * per-block provenance spans into the HTML source.
    */
  final case class Extraction(text: String, blockSpans: Vector[Span], provenance: Vector[Span], title: String)

  private val blockTags = Set(
    "p", "div", "section", "article", "main", "aside", "header", "footer", "nav",
    "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li", "table", "tr", "td", "th",
    "blockquote", "pre", "br", "hr", "form", "figure", "figcaption", "dl", "dt", "dd")
  private val rawTextTags = Set("script", "style", "noscript", "svg", "template")
  private val skipSubtreeTags = Set("head")

  private val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "copy" -> "©", "reg" -> "®", "trade" -> "™", "shy" -> "",
    "laquo" -> "«", "raquo" -> "»", "euro" -> "€", "deg" -> "°",
    "szlig" -> "ß", "auml" -> "ä", "ouml" -> "ö", "uuml" -> "ü",
    "Auml" -> "Ä", "Ouml" -> "Ö", "Uuml" -> "Ü",
  )

  /** Decode HTML entities; unknown entities are kept verbatim. */
  def decodeEntities(s: String): String = {
    val amp = s.indexOf('&')
    if (amp < 0) return s
    val sb = new StringBuilder(s.length)
    sb.append(s.substring(0, amp))
    var i = amp
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          if (body.startsWith("#x") || body.startsWith("#X")) {
            try { sb.appendAll(Character.toChars(Integer.parseInt(body.substring(2), 16))); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else if (body.startsWith("#")) {
            try { sb.appendAll(Character.toChars(Integer.parseInt(body.substring(1)))); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else namedEntities.get(body) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val HrefAttr =
    "(?i)\\bhref\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>\"']+))".r

  /** `href` targets of `<a>` tags in document order, entity-decoded (the
    * markup spells `&amp;` in query strings; the link value is the decoded
    * form). Pure scan, no DOM: the crawl-frontier extractor only needs the
    * attribute values, and a regex per anchor TAG (never per document) keeps
    * it linear. A truncated trailing anchor with an unterminated quoted
    * value yields no link (a half-written URL is not a crawl target).
    */
  def links(html: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) i = n
      else {
        val c = if (lt + 1 < n) html.charAt(lt + 1) else ' '
        val after = if (lt + 2 < n) html.charAt(lt + 2) else ' '
        if ((c == 'a' || c == 'A') && (after.isWhitespace || after == '>' || after == '/')) {
          val gt = html.indexOf('>', lt)
          val end = if (gt < 0) n else gt
          HrefAttr.findFirstMatchIn(html.substring(lt, end)).foreach { m =>
            val raw =
              if (m.group(1) != null) m.group(1)
              else if (m.group(2) != null) m.group(2)
              else m.group(3)
            out += decodeEntities(raw)
          }
          i = end + 1
        } else i = lt + 1
      }
    }
    out.result()
  }

  private final class BlockBuilder {
    val sb = new StringBuilder
    var linkChars = 0
    var headingLevel = 0
    var inList = false
    var srcStart: Int = -1
    var srcEnd: Int = -1
    var pendingSpace = false

    def appendText(t: String, inLink: Boolean, src: Int, srcTo: Int): Unit =
      appendRange(t, 0, t.length, inLink, src, srcTo)

    /** Append a [from,to) slice of `t` — no substring allocation. */
    def appendRange(t: String, from: Int, to: Int, inLink: Boolean, src: Int, srcTo: Int): Unit = {
      val before = sb.length
      var i = from
      while (i < to) {
        val c = t.charAt(i)
        if (Character.isWhitespace(c)) { if (sb.nonEmpty) pendingSpace = true }
        else {
          if (pendingSpace) { sb.append(' '); if (inLink) linkChars += 1; pendingSpace = false }
          sb.append(c)
          if (inLink) linkChars += 1
        }
        i += 1
      }
      // provenance only advances when this segment actually contributed
      // characters — whitespace-only segments must not inflate the span
      if (sb.length > before) {
        if (srcStart < 0) srcStart = src
        srcEnd = srcTo
      }
    }

    def build(): Option[Block] = {
      val t = sb.toString
      if (t.isEmpty) None
      else Some(Block(t, linkChars, headingLevel, inList, math.max(srcStart, 0), math.max(srcEnd, 0)))
    }
  }

  /** Tokenize the HTML into text blocks (single pass, no DOM allocation). */
  def blocks(html: String): Vector[Block] = {
    val out = Vector.newBuilder[Block]
    var cur = new BlockBuilder
    var linkDepth = 0
    var listDepth = 0
    var skipDepth = 0 // inside <head>
    var inTitle = false // <title> outside <head> must not leak into content
    var i = 0
    val n = html.length

    def flush(): Unit = { cur.build().foreach(out += _); cur = new BlockBuilder }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
        } else if (html.startsWith("<!", i) || html.startsWith("<?", i)) {
          val e = html.indexOf('>', i)
          i = if (e < 0) n else e + 1
        } else {
          // quote-aware tag-end scan: a '>' inside a quoted attribute value
          // ("width > height", embedded JSON) must not truncate the tag and
          // leak the attribute tail into extracted text
          var close = -1
          var quote = 0.toChar
          var scan = i + 1
          while (scan < n && close < 0) {
            val ch = html.charAt(scan)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (ch == '>') close = scan
            scan += 1
          }
          if (close < 0) { i = n }
          else {
            // tag name without materializing the attribute body: only isEnd
            // and the (ASCII-folded) name are ever used — one allocation per
            // tag instead of three
            var p = i + 1
            val isEnd = p < close && html.charAt(p) == '/'
            if (isEnd) p += 1
            val nameStart = p
            while (p < close && {
              val ch = html.charAt(p)
              !Character.isWhitespace(ch) && ch != '/'
            }) p += 1
            val nb = new java.lang.StringBuilder(p - nameStart)
            var q = nameStart
            while (q < p) {
              val ch = html.charAt(q)
              nb.append(if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch)
              q += 1
            }
            val name = nb.toString
            // self-closing raw-text syntax (<svg .../>) must not open a
            // raw-text consumption that swallows content to the close tag
            // or EOF (honored for foreign content like svg; for script the
            // HTML5 parser would treat it as open, but eating the document
            // is strictly worse for an extractor — deliberate divergence)
            val selfClosing = close > i + 1 && html.charAt(close - 1) == '/'
            if (rawTextTags.contains(name) && !isEnd && !selfClosing) {
              // consume raw text until matching close tag — case-insensitive:
              // legacy pages close with </SCRIPT>/</STYLE>, and a
              // case-sensitive search would silently drop the whole rest of
              // the document
              val endTag = "</" + name
              val e = indexOfIgnoreCase(html, endTag, close + 1)
              val after = if (e < 0) n else html.indexOf('>', e)
              if (e < 0 || after < 0) { i = n } else { i = after + 1 }
            } else {
              if (skipSubtreeTags.contains(name)) {
                if (!isEnd) skipDepth += 1 else if (skipDepth > 0) skipDepth -= 1
              }
              // HTML5 makes </head> optional: <body> implicitly closes the
              // head — without this, a page omitting </head> extracts EMPTY
              if (name == "body" && !isEnd) skipDepth = 0
              if (name == "title") inTitle = !isEnd
              if (name == "a") { if (!isEnd) linkDepth += 1 else if (linkDepth > 0) linkDepth -= 1 }
              if (name == "ul" || name == "ol") { if (!isEnd) listDepth += 1 else if (listDepth > 0) listDepth -= 1 }
              if (blockTags.contains(name)) {
                flush()
                // block boundary terminates inline anchors (browser-style
                // recovery for unclosed <a> in the wild) — except the
                // inline voids <br>/<hr>, which do not close anchors in any
                // browser ('<a>Home<br>Products</a>' stays one link)
                if (name != "br" && name != "hr") linkDepth = 0
                if (!isEnd && name.length == 2 && name.charAt(0) == 'h' && name.charAt(1) >= '1' && name.charAt(1) <= '6')
                  cur.headingLevel = name.charAt(1) - '0'
                cur.inList = listDepth > 0
              }
              i = close + 1
            }
          }
        }
      } else {
        val next = html.indexOf('<', i)
        val end = if (next < 0) n else next
        if (skipDepth == 0 && !inTitle) {
          // zero-copy fast path: segments without entities append in place.
          // The scan is BOUNDED to this segment — an unbounded indexOf ran
          // to the document tail per segment, O(n²) on pages without '&'
          var amp = i
          while (amp < end && html.charAt(amp) != '&') amp += 1
          if (amp >= end)
            cur.appendRange(html, i, end, linkDepth > 0, i, end)
          else {
            val decoded = decodeEntities(html.substring(i, end))
            cur.appendText(decoded, linkDepth > 0, i, end)
          }
          cur.inList = cur.inList || listDepth > 0
        }
        i = end
      }
    }
    flush()
    out.result()
  }

  /** Case-insensitive indexOf without lowercasing the whole page. */
  private def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    val n = s.length - target.length
    var i = math.max(from, 0)
    while (i <= n) {
      if (s.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  /** Extract the document title (first `<title>` element text). */
  def titleOf(html: String): String = {
    val s = indexOfIgnoreCase(html, "<title", 0)
    if (s < 0) return ""
    val open = html.indexOf('>', s)
    if (open < 0) return ""
    val e = indexOfIgnoreCase(html, "</title", open)
    if (e < 0) return ""
    decodeEntities(html.substring(open + 1, e)).trim.replaceAll("\\s+", " ")
  }

  private val MinContentWords = 8
  private val MaxLinkDensity = 0.33

  /** Content classification: a block is content when it has enough words and
    * low link density; short blocks are promoted when sandwiched between
    * content (Boilerpipe-style neighbor smoothing); headings survive when
    * followed by content.
    */
  def classify(bs: Vector[Block]): Array[Boolean] = {
    val n = bs.length
    val content = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val b = bs(i)
      content(i) = b.words >= MinContentWords && b.linkDensity <= MaxLinkDensity
      i += 1
    }
    // promote headings directly preceding content
    i = n - 2
    while (i >= 0) {
      if (!content(i) && bs(i).headingLevel > 0 && bs(i).linkDensity <= MaxLinkDensity && content(i + 1))
        content(i) = true
      i -= 1
    }
    // promote short low-link blocks sandwiched between content blocks
    i = 1
    while (i < n - 1) {
      if (!content(i) && content(i - 1) && content(i + 1) &&
        bs(i).linkDensity <= MaxLinkDensity && bs(i).words >= 2 && bs(i).headingLevel == 0)
        content(i) = true
      i += 1
    }
    content
  }

  /** Full extraction: classified content blocks joined by `\n`. */
  def extract(html: String): Extraction = {
    val bs = blocks(html)
    val keep = classify(bs)
    val sb = new StringBuilder
    val spans = Vector.newBuilder[Span]
    val prov = Vector.newBuilder[Span]
    var first = true
    var i = 0
    while (i < bs.length) {
      if (keep(i)) {
        if (!first) sb.append('\n')
        val start = sb.length
        sb.append(bs(i).text)
        spans += Span(start, sb.length)
        prov += Span(bs(i).srcStart, bs(i).srcEnd)
        first = false
      }
      i += 1
    }
    Extraction(sb.toString, spans.result(), prov.result(), titleOf(html))
  }

  /** One cell of a top-level `<table>` in document order. Nested tables
    * flatten into the enclosing cell's text (the containment reading a text
    * extractor wants — their structure is not re-emitted as separate
    * tables); `isHeader` marks `<th>` cells; text is entity-decoded and
    * whitespace-collapsed like block text.
    */
  final case class TableCell(
      tableIdx: Int, rowIdx: Int, colIdx: Int, isHeader: Boolean, text: String)

  /** Structured table extraction: every `<td>`/`<th>` cell of every
    * top-level `<table>`, with (table, row, column) coordinates assigned in
    * document order. The scan shares the block tokenizer's protections
    * (comment/CDATA skip, quote-aware tag ends, raw-text consumption,
    * case-insensitive names) but tracks only table structure — one pass, no
    * DOM. Browser-style recovery: an unclosed cell is flushed by the next
    * `<td>`/`<tr>`/`</table>`; a `<td>` before any `<tr>` opens row 0.
    */
  def tables(html: String): Vector[TableCell] = {
    val out = Vector.newBuilder[TableCell]
    var tableIdx = -1 // index among TOP-LEVEL tables seen so far
    var depth = 0 // <table> nesting depth
    var row = -1
    var col = -1
    var inCell = false
    var cellHeader = false
    val sb = new StringBuilder
    var pendingSpace = false

    def flushCell(): Unit = if (inCell) {
      out += TableCell(tableIdx, row, col, cellHeader, sb.toString)
      sb.setLength(0); pendingSpace = false; inCell = false
    }
    def appendSeg(t: String, from: Int, to: Int): Unit = {
      var i = from
      while (i < to) {
        val c = t.charAt(i)
        if (Character.isWhitespace(c)) { if (sb.nonEmpty) pendingSpace = true }
        else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(c)
        }
        i += 1
      }
    }

    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4); i = if (e < 0) n else e + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          val e = html.indexOf("]]>", i + 9); i = if (e < 0) n else e + 3
        } else if (html.startsWith("<!", i) || html.startsWith("<?", i)) {
          val e = html.indexOf('>', i); i = if (e < 0) n else e + 1
        } else {
          var close = -1
          var quote = 0.toChar
          var scan = i + 1
          while (scan < n && close < 0) {
            val ch = html.charAt(scan)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (ch == '>') close = scan
            scan += 1
          }
          if (close < 0) { i = n }
          else {
            var p = i + 1
            val isEnd = p < close && html.charAt(p) == '/'
            if (isEnd) p += 1
            val nameStart = p
            while (p < close && {
              val ch = html.charAt(p)
              !Character.isWhitespace(ch) && ch != '/'
            }) p += 1
            val nb = new java.lang.StringBuilder(p - nameStart)
            var q = nameStart
            while (q < p) {
              val ch = html.charAt(q)
              nb.append(if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch)
              q += 1
            }
            val name = nb.toString
            val selfClosing = close > i + 1 && html.charAt(close - 1) == '/'
            if (rawTextTags.contains(name) && !isEnd && !selfClosing) {
              val endTag = "</" + name
              val e = indexOfIgnoreCase(html, endTag, close + 1)
              val after = if (e < 0) n else html.indexOf('>', e)
              if (e < 0 || after < 0) i = n else i = after + 1
            } else {
              name match {
                case "table" =>
                  if (!isEnd) {
                    depth += 1
                    if (depth == 1) { tableIdx += 1; row = -1; col = -1 }
                  } else if (depth > 0) {
                    if (depth == 1) flushCell()
                    depth -= 1
                  }
                case "tr" if depth == 1 => flushCell(); if (!isEnd) { row += 1; col = -1 }
                case "td" | "th" if depth == 1 =>
                  flushCell()
                  if (!isEnd) {
                    if (row < 0) row = 0
                    col += 1; inCell = true; cellHeader = name == "th"
                  }
                case "br" | "hr" | "p" | "div" | "li" =>
                  // block boundary inside a cell reads as a space, not a glue
                  if (inCell && sb.nonEmpty) pendingSpace = true
                case _ =>
              }
              i = close + 1
            }
          }
        }
      } else {
        val next = html.indexOf('<', i)
        val end = if (next < 0) n else next
        if (inCell) {
          var amp = i
          while (amp < end && html.charAt(amp) != '&') amp += 1
          if (amp >= end) appendSeg(html, i, end)
          else { val d = decodeEntities(html.substring(i, end)); appendSeg(d, 0, d.length) }
        }
        i = end
      }
    }
    flushCell()
    out.result()
  }

  /** `(href, anchorText)` per `<a href=…>` element in document order —
    * the link-graph scan plus the inner text (tags stripped,
    * entity-decoded, whitespace-collapsed) up to the nearest `</a>`
    * (anchors cannot nest in HTML; an unterminated anchor is capped at
    * `maxAnchorLen` source chars so one broken tag cannot quadratically
    * re-scan the page tail). Anchors without an href drop — the consumer
    * is link analytics, and a target-less anchor has no edge.
    */
  def anchors(html: String, maxAnchorLen: Int = 2048): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) i = n
      else {
        val c = if (lt + 1 < n) html.charAt(lt + 1) else ' '
        val after = if (lt + 2 < n) html.charAt(lt + 2) else ' '
        if ((c == 'a' || c == 'A') && (after.isWhitespace || after == '>' || after == '/')) {
          val gt = html.indexOf('>', lt)
          val end = if (gt < 0) n else gt
          val hrefOpt = HrefAttr.findFirstMatchIn(html.substring(lt, end)).map { m =>
            val raw =
              if (m.group(1) != null) m.group(1)
              else if (m.group(2) != null) m.group(2)
              else m.group(3)
            decodeEntities(raw)
          }
          if (hrefOpt.isEmpty) i = end + 1
          else {
            val bodyStart = end + 1
            val closeAt = indexOfIgnoreCase(html, "</a", bodyStart)
            val bodyEnd =
              if (closeAt < 0) math.min(bodyStart + maxAnchorLen, n)
              else math.min(closeAt, bodyStart + maxAnchorLen)
            // strip tags inside the anchor body, collapse whitespace
            val sb = new StringBuilder
            var pendingSpace = false
            var j = bodyStart
            while (j < bodyEnd) {
              val ch = html.charAt(j)
              if (ch == '<') {
                val g = html.indexOf('>', j)
                if (g < 0 || g >= bodyEnd) j = bodyEnd
                else { if (sb.nonEmpty) pendingSpace = true; j = g + 1 }
              } else if (Character.isWhitespace(ch)) {
                if (sb.nonEmpty) pendingSpace = true; j += 1
              } else {
                if (pendingSpace) { sb.append(' '); pendingSpace = false }
                sb.append(ch); j += 1
              }
            }
            out += ((hrefOpt.get, decodeEntities(sb.toString)))
            i = if (closeAt < 0) bodyEnd else closeAt + 1
          }
        } else i = lt + 1
      }
    }
    out.result()
  }

  /** Page-level metadata: title, `<meta name=…>` description/keywords,
    * OpenGraph title, `<link rel=canonical>` href, published time
    * (article:published_time), and the robots-noindex bit. One tag-level
    * scan; attribute values are entity-decoded; first occurrence wins
    * (the browser/crawler convention).
    */
  final case class PageMeta(
      title: String, description: String, keywords: String, canonical: String,
      ogTitle: String, published: String, noindex: Boolean)

  /** Case-insensitive attribute lookup inside one tag body. */
  private def attrOf(tag: String, name: String): String = {
    var i = 0
    val n = tag.length
    while (i < n) {
      val at = indexOfIgnoreCase(tag, name, i)
      if (at < 0) return ""
      // must be a standalone attribute name: preceded by ws/quote/start
      val before = if (at == 0) ' ' else tag.charAt(at - 1)
      var p = at + name.length
      while (p < n && Character.isWhitespace(tag.charAt(p))) p += 1
      // attribute names are whitespace-separated in valid HTML; accepting a
      // quote-before match would false-positive on "name=" INSIDE a quoted
      // attribute value
      if (Character.isWhitespace(before) && p < n && tag.charAt(p) == '=') {
        p += 1
        while (p < n && Character.isWhitespace(tag.charAt(p))) p += 1
        if (p >= n) return ""
        val q = tag.charAt(p)
        if (q == '"' || q == '\'') {
          val e = tag.indexOf(q, p + 1)
          return decodeEntities(tag.substring(p + 1, if (e < 0) n else e))
        }
        var e = p
        while (e < n && !Character.isWhitespace(tag.charAt(e)) && tag.charAt(e) != '>') e += 1
        return decodeEntities(tag.substring(p, e))
      }
      i = at + name.length
    }
    ""
  }

  def metaOf(html: String): PageMeta = {
    var description = ""
    var keywords = ""
    var canonical = ""
    var ogTitle = ""
    var published = ""
    var noindex = false
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) i = n
      else if (html.startsWith("<!--", lt)) {
        // commented-out markup must not contribute metadata
        val e = html.indexOf("-->", lt + 4); i = if (e < 0) n else e + 3
      } else if (html.regionMatches(true, lt, "<meta", 0, 5) ||
        html.regionMatches(true, lt, "<link", 0, 5)) {
        val gt = html.indexOf('>', lt)
        val end = if (gt < 0) n else gt
        val tag = html.substring(lt, end)
        if (html.regionMatches(true, lt, "<meta", 0, 5)) {
          val nm = attrOf(tag, "name").toLowerCase(java.util.Locale.ROOT)
          val prop = attrOf(tag, "property").toLowerCase(java.util.Locale.ROOT)
          val content = attrOf(tag, "content")
          if (nm == "description" && description.isEmpty) description = content
          else if (nm == "keywords" && keywords.isEmpty) keywords = content
          else if (prop == "og:title" && ogTitle.isEmpty) ogTitle = content
          else if (prop == "article:published_time" && published.isEmpty) published = content
          else if (nm == "robots" &&
            content.toLowerCase(java.util.Locale.ROOT).contains("noindex")) noindex = true
        } else {
          val rel = attrOf(tag, "rel").toLowerCase(java.util.Locale.ROOT)
          if (rel == "canonical" && canonical.isEmpty) canonical = attrOf(tag, "href")
        }
        i = end + 1
      } else i = lt + 1
    }
    PageMeta(titleOf(html), description, keywords, canonical, ogTitle, published, noindex)
  }

  /** Decode raw page bytes: honors a UTF-8 BOM, else UTF-8 (web default). */
  def decodeBytes(bytes: Array[Byte]): String = {
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef && (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf)
      new String(bytes, 3, bytes.length - 3, java.nio.charset.StandardCharsets.UTF_8)
    else new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }
}
