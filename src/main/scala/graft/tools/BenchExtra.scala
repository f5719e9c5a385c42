package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Noop-sink stage isolation for expensive queries (guide §1.4) —
  * builder-side instrumentation beside the FROZEN graft.Bench: times each
  * variant with the noop sink so the computation is measured, not the
  * sink. Cited in OPTIMIZATION_r06.md; never run by the driver.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")
    def time(label: String)(df: => DataFrame): Unit = {
      var best = Double.MaxValue
      (0 until 3).foreach { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"bench-extra: $label")
        df.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[extra] $label%-40s $best%8.3f s (min of 3, noop sink)")
    }

    val q24input = t("lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        date_format(col("l_shipdate"), "dd.MM.yyyy").as("gdate"),
        round(col("l_discount") * 100).cast("long").as("pct"))

    time("q24.scan+project")(q24input)
    time("q24.scan+range-exchange")(
      q24input.repartitionByRange(32, col("l_orderkey"), col("l_linenumber")))
    time("q24.full-no-sort")(
      q24input.repartitionByRange(32, col("l_orderkey"), col("l_linenumber"))
        .as[(Long, Int, Long, String, Long)]
        .mapPartitions(_.flatMap { case (ok, ln, cents, gdate, pct) =>
          val text = s"Rechnung Anzahl ${ln * 7 + 3} Betrag ${cents / 100},${"%02d".format(cents % 100)} " +
            s"am $gdate Rabatt $pct % Kontakt kunde$ok@firma.de"
          graft.engine.Extraction.extractLabelsOnly(text).iterator.map { l =>
            val numeric = l.label == "number" || l.label == "amount" || l.label == "percent"
            (ok, ln, l.label, l.text,
              if (numeric) l.normalized.toDouble else 0.0,
              if (numeric) "" else l.normalized)
          }
        })
        .toDF("l_orderkey", "l_linenumber", "label", "span_text", "norm_num", "norm_str"))
    time("q24.full")(graft.SparkEntry.queries("q24_extract_entities")(spark, sfDir))
    time("q24.exchange+decode-only")(
      q24input.repartitionByRange(32, col("l_orderkey"), col("l_linenumber"))
        .as[(Long, Int, Long, String, Long)]
        .mapPartitions(_.flatMap { case (ok, ln, cents, gdate, pct) =>
          if (ok + ln + cents + gdate.length + pct == -1) Iterator.single((ok, ln, "", "", 0.0, ""))
          else Iterator.empty
        })
        .toDF("l_orderkey", "l_linenumber", "label", "span_text", "norm_num", "norm_str"))
    time("q24.kernel-no-emit")(
      q24input.repartitionByRange(32, col("l_orderkey"), col("l_linenumber"))
        .as[(Long, Int, Long, String, Long)]
        .mapPartitions { it =>
          var n = 0L
          it.foreach { case (ok, ln, cents, gdate, pct) =>
            val text = s"Rechnung Anzahl ${ln * 7 + 3} Betrag ${cents / 100},${"%02d".format(cents % 100)} " +
              s"am $gdate Rabatt $pct % Kontakt kunde$ok@firma.de"
            n += graft.engine.Extraction.extractLabelsOnly(text).length
          }
          Iterator.single((n, 0, "", "", 0.0, ""))
        }
        .toDF("l_orderkey", "l_linenumber", "label", "span_text", "norm_num", "norm_str"))

    spark.stop()
  }
}
