package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds plus the
  * headline extraction throughput (docs/sec over the synthetic web corpus —
  * the BASELINE.json metric). SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS come
  * from the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up so the first measured query isn't paying JIT cost
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    graft.engine.Extraction.extractDF(spark, 2000, cpus.toInt).count()

    // SPARK_GRAFT_BENCH_ONLY=q24_extract_entities,q38_feature_frame narrows
    // the sweep for single-query iteration; unset = full contract
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val sweep = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }

    // Per-query warm-up at the smallest sf: the measured pass runs each
    // query exactly ONCE in this fresh JVM, so without warm-up every number
    // is first-execution cost — dominated by C2 compile queueing of the
    // kernels and generated code, not the engine (q24 measured 15.9 s cold
    // vs 2.4 s steady in the same JVM). Running the identical plans over
    // the tiny sf warms the same generated classes and kernel JIT; the
    // warm pass is disclosed, unmeasured, and skippable via
    // SPARK_GRAFT_BENCH_WARM_DIR=none. sf-independent queries (fixture
    // golden, synthetic decode lattices) do full work here — accepted cost.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARM_DIR", "/root/testdata/sf0.001")
    if (warmDir != "none" && java.nio.file.Files.isDirectory(java.nio.file.Paths.get(warmDir))) {
      val t0 = System.nanoTime()
      sweep.foreach { case (name, fn) =>
        // q49 memoizes its composed train→extract per JVM (deliberate — the
        // spec and oracle surface share one model); warming it would turn
        // the measured pass into a cache hit, so it stays cold
        if (name != "q49_fixture_golden") {
          try fn(spark, warmDir).count()
          catch { case e: Throwable => System.err.println(s"[bench] warm $name failed: ${e.getMessage}") }
        }
      }
      System.err.println(f"[bench] warm sweep over $warmDir: ${(System.nanoTime() - t0) / 1e9}%.1f s (unmeasured)")
    }

    // Per query: min of `trials` measured executions (default 2). The host
    // throttles sporadically under sustained all-core load (multi-second
    // stalls with all workers RUNNABLE, no GC, no locks — observed 2.4 s vs
    // 34 s for the identical warm q24), so a single execution samples the
    // throttle lottery; the min is the steady-state engine cost. Queries
    // whose job memoizes per JVM run 1 trial — a second execution would
    // time the cache hit, not the job: q49 (composed train→extract golden,
    // FixtureGoldenJob.cache) and q47 (IVF index, AnnIndexJob.cachedIndex).
    val singleTrial = Set("q49_fixture_golden", "q47_ann_ivf", "q74_snapshot_dedup",
      "q75_warc_roundtrip", "q77_ingest_pipeline")
    val trials = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "2").toInt)
    val results = sweep.map { case (name, fn) =>
      val k = if (singleTrial(name)) 1 else trials
      var best = Double.MaxValue
      var ok = true
      var t = 0
      while (t < k && ok) {
        val t0 = System.nanoTime()
        ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable => System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
        val sec = (System.nanoTime() - t0) / 1e9
        // a failure reports the FAILING run's time (negative — visible,
        // never mistaken for a fast success), not the min across trials
        best = if (ok) math.min(best, sec) else sec
        t += 1
      }
      name -> (if (ok) best else -best)
    }

    // headline: extraction docs/sec over a materialized page table (the
    // engine's contract input — scan → extract, same shape as ScalingBench).
    // Measured in a FRESH session: a production extraction run is a dedicated
    // job, not one scheduled behind 53 other queries in the same JVM session —
    // the sweep leaves cached blocks/broadcasts/GC debt that depressed the
    // post-sweep reading ~10× vs an identical fresh-session run.
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "60000").toLong
    val pagesDir = java.nio.file.Files.createTempDirectory("graft_bench_pages").toString + "/pages"
    graft.engine.Extraction.syntheticPages(spark, nDocs, cpus.toInt * 4)
      .write.mode("overwrite").parquet(pagesDir)
    spark.stop()
    val spark2 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark2.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, count, lit, sum => sqlsum}
    import spark2.implicits._
    var extracted = 0L
    var extractSec = Double.MaxValue
    // best of 3: the host's throughput drifts heavily between windows and
    // the first trial additionally pays the fresh session's JIT/codegen cost
    (0 until 3).foreach { _ =>
      val t0 = System.nanoTime()
      extracted = graft.engine.Extraction.extract(
        spark2.read.parquet(pagesDir).as[graft.engine.PageRow]).toDF()
        .agg(count(lit(1)), sqlsum(col("n_tokens")))
        .collect()(0).getLong(0)
      extractSec = math.min(extractSec, (System.nanoTime() - t0) / 1e9)
    }
    val docsPerSec = extracted / extractSec
    val docsPerSecPerCore = docsPerSec / cpus.toInt

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // headline total sums ONLY successful queries (a failure must never
    // reduce the reported time); failures are listed explicitly
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        s""""failed":${failed.mkString("[", ",", "]")},"n_failed":${failed.size},""" +
        s""""extract_docs":$extracted,"extract_sec":$extractSec,"extract_docs_per_sec":$docsPerSec,""" +
        s""""extract_docs_per_sec_per_core":$docsPerSecPerCore,"cpus":$cpus,""" +
        s""""query_trials":$trials}"""
    println(json)
    // the metric line ALSO lands in its own file: the driver captures the
    // tail of stdout and a long sweep once self-truncated the recorded
    // BENCH artifact (lost q01–q03 + the total) — the file copy is whole
    // by construction
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LATEST.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outFile: ${e.getMessage}") }
    spark2.stop()
  }
}
