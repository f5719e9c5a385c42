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

  /** PRECONDITION — deterministic input partitions. The salt is
    * `monotonically_increasing_id` = (partition id, row position), chosen
    * over rand() (task retries must re-derive the same salt) and over a
    * pure content hash (identical rows — the normal case after projecting
    * to the key column, or in duplicate-heavy crawls — would all hash to
    * ONE salt and the hot key would collapse back onto a single reducer).
    * Row position is only retry-stable when each input partition's CONTENTS
    * AND ORDER are deterministic: true for a scan-direct input (file scans
    * replay identically, and re-reading a live prior exchange's shuffle
    * files does too), NOT true when the upstream shuffle must itself be
    * recomputed after executor loss over a nondeterministic order — the
    * SPARK-23207 class of bug, where a partial retry re-derives different
    * salts and loses/duplicates rows. Feed this from a scan, or
    * checkpoint/localCheckpoint the input first, on preemptible executors.
    */
  def withSalt(df: DataFrame, nSalts: Int): DataFrame =
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
