package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys (Common-Crawl host skew: a few hosts carry
  * most pages). Two tools:
  *
  *  - [[saltedRepartition]]: spread one logical key over `nSalts` physical
  *    partitions (joins/mapGroups on skewed keys).
  *  - [[twoPhaseAgg]]: salted partial aggregation — aggregate by
  *    (key, salt) first (map-side + small shuffle slices), then re-aggregate
  *    by key. Turns one hot reducer into `nSalts` balanced ones; correct for
  *    any algebraic aggregate passed as (partial, merge) column pairs.
  */
object Skew {

  def withSalt(df: DataFrame, nSalts: Int): DataFrame =
    // deterministic salt from the row's own content hash, not rand(): keeps
    // repeated runs identical (resume/debug) while spreading uniformly
    df.withColumn("__salt", pmod(hash(struct(df.columns.map(col).toIndexedSeq: _*)), lit(nSalts)))

  def saltedRepartition(df: DataFrame, keyCol: String, nSalts: Int, numPartitions: Int): DataFrame =
    withSalt(df, nSalts).repartition(numPartitions, col(keyCol), col("__salt")).drop("__salt")

  /** aggs: (aggregated column over the salted group, re-aggregation of that
    * column over the final group, output name).
    */
  def twoPhaseAgg(
      df: DataFrame,
      keyCol: String,
      nSalts: Int,
      aggs: Seq[(Column, String => Column, String)],
  ): DataFrame = {
    val salted = withSalt(df, nSalts)
      .groupBy(col(keyCol), col("__salt"))
      .agg(aggs.head._1.as(s"__p_${aggs.head._3}"),
        aggs.tail.map(a => a._1.as(s"__p_${a._3}")): _*)
    salted.groupBy(col(keyCol))
      .agg(aggs.head._2(s"__p_${aggs.head._3}").as(aggs.head._3),
        aggs.tail.map(a => a._2(s"__p_${a._3}").as(a._3)): _*)
  }
}
