package graft.tools

import graft.engine.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew evidence for the corpus-wide line dedup at scale: build the
  * q56-style boilerplate-wrapped corpus over a (derived, see
  * [[ScaleData]]) documents table, run the production
  * [[Dedup.dedupLines]], and report what AQE actually DID to the hot-line
  * join in the executed plan — the `dedupLines` join back on `line` is
  * hot-key-skewed BY CONSTRUCTION (the corpus-wide header lands on one
  * reducer), and the named mitigation (AQE skew-split) was previously
  * asserted but never observed.
  *
  * Two disclosed tuning choices make the sandbox run exercise the plan
  * shape that 100-TB input forces naturally:
  *   - broadcast joins are disabled: at scale the `firsts` side (all
  *     distinct lines of the corpus) exceeds any broadcast threshold, so
  *     the join IS a sort-merge join — the sandbox must not let a 30-MB
  *     broadcast hide the skew question;
  *   - the AQE skew thresholds are scaled down to sandbox partition sizes
  *     (defaults: 256 MB / factor 5, tuned for multi-GB shuffles). The
  *     FACTOR criterion (hot partition vs median) is the scale-invariant
  *     signal; the byte floor is proportional to input size.
  * Both are env-overridable (SPARK_GRAFT_SKEW_THRESH / _FACTOR /
  * _ADVISORY).
  *
  * Usage: runMain graft.tools.ScaleStress [scaledDir]
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaledata/sf10")
    // SPARK_GRAFT_SHUFFLE_COMPRESS=false: control for the byte-stats
    // confound — AQE skew stats are COMPRESSED partition bytes, and
    // identical boilerplate lines compress 50-100×, so a row-count skew
    // can sit below every byte threshold. Running uncompressed removes
    // that confound; the round-4 audit showed the dedup join STILL never
    // skew-splits because of the plan-shape limitation (see main), which
    // is why the structural fixes in Dedup.dedupLines exist.
    val compress = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        sys.env.getOrElse("SPARK_GRAFT_SKEW_FACTOR", "2.0"))
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        sys.env.getOrElse("SPARK_GRAFT_SKEW_THRESH", "16m"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "8m"))
      .config("spark.shuffle.compress", compress)
      .config("spark.shuffle.spill.compress", compress)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val broadcastFirsts = sys.env.get("SPARK_GRAFT_BROADCAST_FIRSTS").contains("1")
    if (sys.env.get("SPARK_GRAFT_AQE_DEBUG").contains("1"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.adaptive",
        org.apache.logging.log4j.Level.DEBUG)

    // SPARK_GRAFT_SKEW_REPRO=1: a textbook skew join (one hot key over two
    // large sides, no aggregation) to establish whether OptimizeSkewedJoin
    // fires AT ALL under this Spark build + conf — separates "the rule
    // can't see our shape" from "the rule never triggers at these sizes"
    if (sys.env.contains("SPARK_GRAFT_SKEW_REPRO")) {
      import spark.implicits._
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.adaptive",
        org.apache.logging.log4j.Level.DEBUG)
      val left = spark.range(0, 5000000).select(
        when(col("id") % 10 === 0, lit(0L)).otherwise(col("id")).as("k"),
        concat(lit("padpadpadpadpadpadpadpadpadpad-"), col("id")).as("v"))
      val right0 = spark.range(0, 100000).select(col("id").as("k"), col("id").as("w"))
      // mode 2 (aggregated right side) was meant to isolate the
      // dedupLines shape, but Catalyst prunes this particular join
      // entirely (unique right keys, no referenced columns) — the
      // plan-shape evidence therefore comes from the REAL dedupLines run:
      // mode 1 fires OptimizeSkewedJoin ("Optimizing skewed join." +
      // skew=true in the plan) while the production job at identical conf
      // never reaches the rule's log line, because its build side is
      // Sort←HashAggregate←stage and the rule only matches
      // Sort←ShuffleQueryStage children.
      val right = if (sys.env("SPARK_GRAFT_SKEW_REPRO") == "2")
        right0.groupBy("k").agg(min(col("w")).as("w")) else right0
      val j = left.join(right, Seq("k"), "left").groupBy().agg(count(lit(1)).as("n"))
      j.collect()
      val exr = j.queryExecution.executedPlan.toString
      def cr(p: String) = p.r.findAllIn(exr).length
      println(s"[scalestress-repro] smj=${cr("SortMergeJoin")} skew_marked=${cr("skew=true")} " +
        s"aqe_reads=${cr("AQEShuffleRead")}")
      exr.linesIterator.filter(l => l.contains("Join") || l.contains("Aggregate") || l.contains("Exchange"))
        .take(10).foreach(l => println("[scalestress-repro-plan] " + l.trim.take(160)))
      spark.stop(); return
    }

    // the q56 construction: every doc wrapped in a corpus-wide header (the
    // hot line: one occurrence PER DOCUMENT) and a footer shared per id%10
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val body = text.split(" ", -1) /* keep trailing empties: DuckDB string_split semantics, or a trailing-space doc diverges from the oracle */ .grouped(8).map(_.mkString(" ")).mkString("\n")
        (id, s"CORPUS HEADER BOILERPLATE\n$body\nFooter ${id % 10}")
      }
      .toDF("doc_id", "text")

    // the row-count skew AQE must contend with: hot line occurrences vs
    // the per-partition median of the exploded line stream
    val lineStats = docs.select(posexplode(split(col("text"), "\n")).as(Seq("idx", "line")))
      .groupBy("line").count().orderBy(col("count").desc).limit(1).collect()(0)
    println(s"[scalestress] hottest line ${lineStats.getLong(1)} occurrences " +
      s"('${lineStats.getString(0).take(40)}')")

    val t0 = System.nanoTime()
    val out = Dedup.dedupLines(docs, "doc_id", "text",
      firstsMode = if (broadcastFirsts) Dedup.FirstsMode.Broadcast else Dedup.FirstsMode.Shuffle)
      .groupBy().agg(count(lit(1)).as("docs"), sum("n_lines_kept").as("lines"))
    val row = out.collect()(0)
    val sec = (System.nanoTime() - t0) / 1e9
    val ex = out.queryExecution.executedPlan.toString
    def c(p: String) = p.r.findAllIn(ex).length
    println(f"[scalestress] dir=$dir compress=$compress broadcast_firsts=$broadcastFirsts " +
      f"docs_kept=${row.getLong(0)} lines_kept=${row.getLong(1)} wall=$sec%.1f s")
    println(s"[scalestress] smj=${c("SortMergeJoin")} bhj=${c("BroadcastHashJoin")} " +
      s"skew_marked=${c("skew=true")} exchanges=${c("Exchange hashpartitioning")} " +
      s"aqe_shuffle_reads=${c("AQEShuffleRead")} coalesced=${c("coalesced")}")
    ex.linesIterator.filter(l => l.contains("SortMergeJoin") || l.contains("skew"))
      .take(8).foreach(l => println("[scalestress-plan] " + l.trim.take(200)))
    sys.env.get("SPARK_GRAFT_PLAN_DUMP").foreach { f =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(f), ex)
      println(s"[scalestress] full executed plan -> $f")
    }
    spark.stop()
  }
}
