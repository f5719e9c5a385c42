package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Section (annotation-set) machinery: the line-level section-start
  * classifier + extraction routing (C5/C6, information_extraction.py:
  * 2071-2459). Routing is the as-of pattern: each extraction joins the most
  * recent preceding section start — `last(_, ignoreNulls) over (partition
  * doc order by offset rows unbounded preceding..current)`, one shuffle on
  * doc, no self-join.
  */
object Sections {

  /** Deterministic line-level section-start score (the stand-in for the
    * reference's per-line RandomForest): a line opens a section when it is
    * short, starts uppercase, and ends without sentence punctuation —
    * heading-shaped. Returns [0,1].
    */
  def sectionStartScore(line: String): Double = {
    val t = line.trim
    if (t.isEmpty) return 0.0
    var z = -1.0
    if (Character.isUpperCase(t.charAt(0))) z += 1.2
    if (t.length < 48) z += 1.0
    val last = t.charAt(t.length - 1)
    if (last != '.' && last != ',' && last != ';') z += 0.8
    val words = t.split(" ").length
    if (words <= 6) z += 0.6
    1.0 / (1.0 + math.exp(-z))
  }

  /** Route rows to their enclosing section: `df` must have (docCol, posCol,
    * isStartCol); adds `section_start` = position of the most recent start
    * at-or-before the row (C6 as-of semantics; leftovers before the first
    * start get the default section = null → coalesced to 0).
    */
  def assignSections(df: DataFrame, docCol: String, posCol: String, isStartCol: String): DataFrame = {
    val w = Window.partitionBy(col(docCol)).orderBy(col(posCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("section_start",
      coalesce(last(when(col(isStartCol), col(posCol)), ignoreNulls = true).over(w), lit(0L)))
  }
}
