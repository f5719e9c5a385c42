package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured extraction from raw markup beyond the main-content text:
  * table cells with (table, row, column) coordinates and page-level
  * metadata (title/description/canonical/OpenGraph/robots). Both are one
  * narrow mapPartitions over the page scan — per-row parses with no
  * exchange; coordinates and field values are pure functions of the page
  * bytes, so results are byte-identical at any parallelism.
  *
  * Reference scope note: konfuzio-sdk ingests OCR'd documents and has no
  * HTML stage; these operators serve the Common-Crawl-style corpus this
  * engine targets (structured data mining from crawled pages).
  */
object Structure {

  /** Every `<td>`/`<th>` cell of every top-level `<table>` on each page:
    * `(id, table_idx, row_idx, col_idx, is_header, cell)`. Pages without
    * tables contribute no rows. See [[graft.core.Html.tables]] for the
    * parse contract (nested tables flatten into the enclosing cell).
    */
  def tableCells(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, h) =>
        if (h == null) Iterator.empty
        else graft.core.Html.tables(graft.core.Html.decodeBytes(h)).iterator.map { c =>
          (id, c.tableIdx, c.rowIdx, c.colIdx, c.isHeader, c.text)
        }
      })
      .toDF(idCol, "table_idx", "row_idx", "col_idx", "is_header", "cell")
  }

  /** Document heading outline: one row per `<h1>`-`<h6>` block in reading
    * order with its ancestor path — `(id, seq, level, heading, path)`,
    * `path` = ancestor headings joined by " > " (a deeper-or-equal heading
    * pops the stack to its parent level first, the HTML5 outline
    * discipline). Rides [[graft.core.Html.blocks]]' heading tracking, so
    * boilerplate protections (script/comment/title) are inherited; same
    * narrow one-pass shape as the other extractors.
    */
  def outline(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, h) =>
        if (h == null) Iterator.empty
        else {
          val heads = graft.core.Html.blocks(graft.core.Html.decodeBytes(h))
            .filter(_.headingLevel > 0)
          val stack = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
          heads.iterator.zipWithIndex.map { case (b, seq) =>
            while (stack.nonEmpty && stack.last._1 >= b.headingLevel) stack.remove(stack.length - 1)
            stack += ((b.headingLevel, b.text))
            (id, seq, b.headingLevel, b.text, stack.map(_._2).mkString(" > "))
          }
        }
      })
      .toDF(idCol, "seq", "level", "heading", "path")
  }

  /** Page metadata row per input page:
    * `(id, title, description, keywords, canonical, og_title, published,
    * noindex)` — first occurrence wins per field, commented-out markup
    * ignored. See [[graft.core.Html.metaOf]].
    */
  def pageMeta(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, h) =>
        val m =
          if (h == null) graft.core.Html.PageMeta("", "", "", "", "", "", noindex = false)
          else graft.core.Html.metaOf(graft.core.Html.decodeBytes(h))
        (id, m.title, m.description, m.keywords, m.canonical, m.ogTitle, m.published, m.noindex)
      })
      .toDF(idCol, "title", "description", "keywords", "canonical", "og_title",
        "published", "noindex")
  }
}
