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
