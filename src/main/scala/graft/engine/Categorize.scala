package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorization fallback (C7, document_categorization.py:54-93): assign
  * the first category whose fallback name occurs as a substring of the
  * lowercased document text; no-op when already categorized. A coalesced
  * when-chain — pure Catalyst expressions, fully codegen'd.
  */
object Categorize {

  /** Ordered (categoryName, fallbackKeyword) pairs — first match wins. */
  def categorizeExpr(textCol: Column, categories: Seq[(String, String)]): Column = {
    val lowered = lower(textCol)
    categories.foldRight(lit("none"): Column) { case ((cat, kw), els) =>
      // Locale.ROOT so a tr-TR JVM can't fold "I" to dotless ı and
      // silently stop matching; case-insensitive keyword matching is a
      // deliberate (documented) widening of the reference, which tests the
      // RAW fallback name against lowered text
      // (document_categorization.py:79-82) and so can never match an
      // uppercase keyword at all
      when(lowered.contains(kw.toLowerCase(java.util.Locale.ROOT)), lit(cat)).otherwise(els)
    }
  }

  def categorize(df: DataFrame, textCol: String, categories: Seq[(String, String)],
      existing: Option[String] = None): DataFrame = {
    val computed = categorizeExpr(col(textCol), categories)
    val value = existing match {
      case Some(c) => when(col(c).isNotNull && col(c) =!= "none", col(c)).otherwise(computed)
      case None => computed
    }
    df.withColumn("category", value)
  }
}
