package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical._
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

  /** The SPARK-23207 class of bug, STRUCTURALLY closed: the salt is
    * `monotonically_increasing_id` = (partition id, row position), chosen
    * over rand() (task retries must re-derive the same salt) and over a
    * pure content hash (identical rows — the normal case after projecting
    * to the key column, or in duplicate-heavy crawls — would all hash to
    * ONE salt and the hot key would collapse back onto a single reducer).
    * Row position is only retry-stable when each input partition's CONTENTS
    * AND ORDER are deterministic: true for a scan-direct input (file scans
    * replay identically), NOT true when the upstream shuffle must itself be
    * recomputed after executor loss over a nondeterministic order — a
    * partial retry would re-derive different salts and lose/duplicate rows.
    *
    * [[withSalt]] therefore REFUSES (IllegalArgumentException, in code, not
    * prose) any input whose analyzed plan contains a shuffle-inducing
    * operator (join / aggregate / window / repartition / global sort /
    * limit) or a nondeterministic expression — exactly the inputs where
    * position-derived salts can diverge on retry. For those, use
    * [[withSaltStable]]: it `localCheckpoint`s the input first, so the
    * salted rows derive from MATERIALIZED partition blocks — a retry
    * re-reads the same bytes, and a lost block fails the job loudly
    * instead of silently re-deriving different salts.
    *
    * Residual scope: a deterministic per-partition `mapPartitions` between
    * the scan and the salt is invisible to the plan walk and accepted; a
    * NONdeterministic user function there remains the caller's contract.
    */
  def withSalt(df: DataFrame, nSalts: Int): DataFrame = {
    val plan = df.queryExecution.analyzed
    val offender = plan.collectFirst {
      case p @ (_: Join | _: Aggregate | _: Window | _: Distinct | _: Deduplicate |
                _: RepartitionOperation | _: GlobalLimit) => p.nodeName
      // sortWithinPartitions (global = false) induces no shuffle and is
      // deterministic over a deterministic child — only a GLOBAL sort
      // (range exchange, sampled boundaries) is in the hazard class
      case s: Sort if s.global => s.nodeName
      case p if p.expressions.exists(e => !e.deterministic) => s"nondeterministic ${p.nodeName}"
    }
    require(offender.isEmpty,
      s"withSalt: input plan contains '${offender.get}' — position-derived salts are not " +
        "retry-stable over a recomputable shuffle (SPARK-23207). Use withSaltStable " +
        "(checkpointed) for this input, or salt the scan-direct side instead.")
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(nSalts)))
  }

  /** Retry-stable salting for ARBITRARY inputs: eagerly `localCheckpoint`s
    * the input (materializing its partitions) and salts the materialized
    * blocks by (partition id, row position). A task retry re-reads the
    * same block bytes — same salts; a lost block is a loud job failure,
    * never a silent salt divergence. Costs one materialization of `df`.
    */
  def withSaltStable(df: DataFrame, nSalts: Int): DataFrame =
    df.localCheckpoint(true)
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(nSalts)))

  def saltedRepartition(df: DataFrame, keyCol: String, nSalts: Int, numPartitions: Int,
      stable: Boolean = false): DataFrame =
    (if (stable) withSaltStable(df, nSalts) else withSalt(df, nSalts))
      .repartition(numPartitions, col(keyCol), col("__salt")).drop("__salt")

  /** aggs: (aggregated column over the salted group, re-aggregation of that
    * column over the final group, output name).
    */
  def twoPhaseAgg(
      df: DataFrame,
      keyCol: String,
      nSalts: Int,
      aggs: Seq[(Column, String => Column, String)],
      stable: Boolean = false,
  ): DataFrame = {
    require(aggs.nonEmpty, "twoPhaseAgg: at least one aggregate required")
    require(aggs.map(_._3).distinct.size == aggs.size,
      s"twoPhaseAgg: duplicate output names in ${aggs.map(_._3)}")
    val salted = (if (stable) withSaltStable(df, nSalts) else withSalt(df, nSalts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(aggs.head._1.as(s"__p_${aggs.head._3}"),
        aggs.tail.map(a => a._1.as(s"__p_${a._3}")): _*)
    salted.groupBy(col(keyCol))
      .agg(aggs.head._2(s"__p_${aggs.head._3}").as(aggs.head._3),
        aggs.tail.map(a => a._2(s"__p_${a._3}").as(a._3)): _*)
  }
}
