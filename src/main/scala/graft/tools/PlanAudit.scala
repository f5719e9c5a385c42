package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for the audit-critical queries and grep the
  * properties that matter at scale: parquet PushedFilters, pruned ReadSchema,
  * broadcast vs shuffle joins, WholeStageCodegen spans, Exchange count.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pushdown_agg", "q02_broadcast_join", "q03_shuffle_join_agg",
        "q04_filter_project", "q12_token_count", "q10_compare_strict", "q36_section_assign")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"==================== $n ====================")
      println(plan)
      val exchanges = "Exchange".r.findAllIn(plan).length
      val wsc = "WholeStageCodegen".r.findAllIn(plan).length
      println(s"[audit] $n: exchanges=$exchanges wholestage_spans=$wsc")
      // SPARK_GRAFT_EXECUTE=1: run the query and report the EXECUTED plan —
      // under AQE this is where exchange reuse and skew-split decisions
      // land, which the static explain cannot show
      if (sys.env.get("SPARK_GRAFT_EXECUTE").contains("1")) {
        // drive THIS df's queryExecution (a df.count() would spawn a
        // separate one and leave this adaptive plan unfinalized) WITHOUT
        // collecting rows to the driver — an un-aggregated query over a
        // scaled corpus would otherwise OOM the audit
        df.queryExecution.toRdd.count()
        val ex = df.queryExecution.executedPlan.toString
        def c(p: String) = p.r.findAllIn(ex).length
        println(s"[audit-executed] $n: exchanges=${c("Exchange")} " +
          s"reused_exchanges=${c("ReusedExchange")} reused_shuffles=${c("ShuffleQueryStage")} " +
          s"skew_joins=${c("skew=true")} bhj=${c("BroadcastHashJoin")} smj=${c("SortMergeJoin")}")
      }
    }
    spark.stop()
  }
}
