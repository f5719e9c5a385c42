package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Structured extraction from markup: table cells, anchor texts, page
  * metadata — the parse contracts behind q85/q86/q87.
  */
class HtmlStructureSpec extends AnyFunSuite {

  // --- tables ---

  test("tables: header + data rows get (table,row,col) coordinates") {
    val h = "<table><tr><th>A</th><th>B</th></tr>" +
      "<tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></table>"
    val cells = Html.tables(h)
    assert(cells.map(c => (c.tableIdx, c.rowIdx, c.colIdx, c.isHeader, c.text)) == Vector(
      (0, 0, 0, true, "A"), (0, 0, 1, true, "B"),
      (0, 1, 0, false, "1"), (0, 1, 1, false, "2"),
      (0, 2, 0, false, "3"), (0, 2, 1, false, "4")))
  }

  test("tables: two top-level tables index independently") {
    val h = "<table><tr><td>x</td></tr></table><p>between</p>" +
      "<table><tr><td>y</td></tr></table>"
    val cells = Html.tables(h)
    assert(cells.map(c => (c.tableIdx, c.rowIdx, c.colIdx, c.text)) ==
      Vector((0, 0, 0, "x"), (1, 0, 0, "y")))
  }

  test("tables: nested table flattens into the enclosing cell") {
    val h = "<table><tr><td>outer <table><tr><td>inner</td></tr></table></td>" +
      "<td>plain</td></tr></table>"
    val cells = Html.tables(h)
    assert(cells.map(c => (c.tableIdx, c.rowIdx, c.colIdx, c.text)) ==
      Vector((0, 0, 0, "outer inner"), (0, 0, 1, "plain")))
  }

  test("tables: entities decode, inline tags strip, block tags space-separate") {
    val cells = Html.tables(
      "<table><tr><td>a&amp;b <b>c</b></td><td>x<br>y</td></tr></table>")
    assert(cells.map(_.text) == Vector("a&b c", "x y"))
  }

  test("tables: unclosed cells recover at the next td/tr/close") {
    val h = "<table><tr><td>a<td>b<tr><td>c</table>"
    val cells = Html.tables(h)
    assert(cells.map(c => (c.rowIdx, c.colIdx, c.text)) ==
      Vector((0, 0, "a"), (0, 1, "b"), (1, 0, "c")))
  }

  test("tables: td before any tr opens row 0; text outside cells ignored") {
    val cells = Html.tables("<table>stray<td>a</td></table>tail")
    assert(cells.map(c => (c.rowIdx, c.colIdx, c.text)) == Vector((0, 0, "a")))
  }

  test("tables: script inside a cell is consumed, comments skipped") {
    val cells = Html.tables(
      "<table><tr><td><script>var t = '<td>no</td>';</script>a" +
        "<!-- <td>also no</td> -->b</td></tr></table>")
    assert(cells.map(_.text) == Vector("ab"))
  }

  test("tables: no tables means no cells") {
    assert(Html.tables("<p>just text</p>").isEmpty)
  }

  // --- anchors ---

  test("anchors: href plus stripped, collapsed, decoded inner text") {
    val a = Html.anchors(
      "<a href=\"/x?a=1&amp;b=2\">go  <b>now</b>\n please</a>" +
        "<a href='/y'>second</a>")
    assert(a == Vector(("/x?a=1&b=2", "go now please"), ("/y", "second")))
  }

  test("anchors: href-less anchors drop; unterminated anchor is capped") {
    val a = Html.anchors("<a name=\"n\">skip</a><a href=\"/z\">tail text", maxAnchorLen = 4)
    assert(a == Vector(("/z", "tail")))
  }

  test("anchors: case-insensitive tag and closing") {
    assert(Html.anchors("<A HREF='/u'>Hi</A>") == Vector(("/u", "Hi")))
  }

  // --- page metadata ---

  test("metaOf: all fields extracted, first occurrence wins") {
    val h = "<head><title>T &amp; Co</title>" +
      "<meta name=\"description\" content=\"first\">" +
      "<meta name=\"description\" content=\"second\">" +
      "<meta name=\"keywords\" content=\"a,b\">" +
      "<link rel=\"canonical\" href=\"https://c.example/p\">" +
      "<meta property=\"og:title\" content=\"OG\">" +
      "<meta property=\"article:published_time\" content=\"2024-01-02\">" +
      "</head>"
    val m = Html.metaOf(h)
    assert(m.title == "T & Co")
    assert(m.description == "first")
    assert(m.keywords == "a,b")
    assert(m.canonical == "https://c.example/p")
    assert(m.ogTitle == "OG")
    assert(m.published == "2024-01-02")
    assert(!m.noindex)
  }

  test("metaOf: robots noindex detected case-insensitively") {
    assert(Html.metaOf("<meta name=\"ROBOTS\" content=\"NOINDEX, nofollow\">").noindex)
    assert(!Html.metaOf("<meta name=\"robots\" content=\"nofollow\">").noindex)
  }

  test("metaOf: commented-out meta is ignored") {
    val m = Html.metaOf(
      "<!-- <meta name=\"description\" content=\"decoy\"> -->" +
        "<meta name=\"description\" content=\"real\">")
    assert(m.description == "real")
  }

  test("metaOf: attribute order is free; 'name=' inside a value is not a key") {
    val m = Html.metaOf("<meta content=\"name=trap\" name=\"description\">")
    assert(m.description == "name=trap")
  }

  test("metaOf: unquoted attribute values parse") {
    val m = Html.metaOf("<meta name=description content=short>")
    assert(m.description == "short")
  }
}
