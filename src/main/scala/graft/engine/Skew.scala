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
    // deterministic salt, not rand() (task retries must re-derive the same
    // salt), but NOT a pure content hash either: identical rows — the
    // normal case after a projection to the key column, or in duplicate-
    // heavy crawls — would all hash to ONE salt and the hot key would
    // collapse back onto a single reducer. monotonically_increasing_id is
    // derived from (partition id, row position), so it is stable across
    // retries of a deterministic scan while spreading every row, identical
    // or not, round-robin over the salts.
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(nSalts)))

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
    require(aggs.nonEmpty, "twoPhaseAgg: at least one aggregate required")
    require(aggs.map(_._3).distinct.size == aggs.size,
      s"twoPhaseAgg: duplicate output names in ${aggs.map(_._3)}")
    val salted = withSalt(df, nSalts)
      .groupBy(col(keyCol), col("__salt"))
      .agg(aggs.head._1.as(s"__p_${aggs.head._3}"),
        aggs.tail.map(a => a._1.as(s"__p_${a._3}")): _*)
    salted.groupBy(col(keyCol))
      .agg(aggs.head._2(s"__p_${aggs.head._3}").as(aggs.head._3),
        aggs.tail.map(a => a._2(s"__p_${a._3}").as(a._3)): _*)
  }
}
