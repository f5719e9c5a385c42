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

    // ---- q59 stage isolation: time cumulative prefixes of the composed
    // pipeline so the expensive stage names itself (each timing uses the
    // declared query code path via SparkEntry where possible)
    def timeOnce(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[extra] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s (1 run)")
    }
    timeOnce("q59.full")(
      graft.SparkEntry.queries("q59_llm_pipeline")(spark, sfDir).count())
    timeOnce("q59.full(2nd)")(
      graft.SparkEntry.queries("q59_llm_pipeline")(spark, sfDir).count())
    // stage replica with timers at each eager boundary (mirrors the q59
    // definition; the declared query is untouched)
    locally {
      import spark.implicits._
      import graft.engine.{Dedup, Extraction, PageRow, Redact}
      val t00 = System.nanoTime()
      def mark(l: String, t0: Long): Long = {
        println(f"[extra] q59.stage.$l%-33s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        System.nanoTime()
      }
      val pages = t("documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (i, text) =>
          val key = if (i % 10 == 9) i - 1 else i
          val scheme = if (i % 2 == 0) "HTTPS" else "https"
          val qs = if (i % 3 == 0) "?utm_source=feed&x=1" else "?x=1"
          val url = s"$scheme://Site${key % 7}.Example.com/d$key$qs"
          val page =
            if (i % 17 == 0)
              "CORPUS HEADER\nshared duplicate page body here words repeated\n" +
                "contact dup@dup.com now\nFooter X"
            else if (i % 13 >= 1 && i % 13 <= 3) {
              val a = i - (i % 13) + 1
              val body = (0 until 120).map(j => s"u${a}x$j")
                .grouped(8).map(_.mkString(" ")).mkString("\n")
              s"CORPUS HEADER\n$body\nvariant v${i % 13}\n" +
                s"contact user$a@mail${a % 5}.com now\nFooter ${i % 10}"
            } else {
              val body = text.split(" ", -1).grouped(8).map(_.mkString(" ")).mkString("\n")
              s"CORPUS HEADER\n$body\ncontact user$i@mail${i % 5}.com now\nFooter ${i % 10}"
            }
          (i, graft.core.UrlOps.canonicalize(url), page)
        })
        .toDF("doc_id", "canon_url", "page_text")
      val s1 = Dedup.keepFirstBy(pages, "doc_id", col("canon_url"))
      val s2 = Dedup.keepFirstBy(s1, "doc_id", md5(col("page_text")))
      val s2cp = s2.localCheckpoint(true)
      var tm = mark("construct+2dedup+checkpoint", t00)
      val s3 = Dedup.dedupNearText(s2cp, "doc_id", "page_text",
        threshold = 0.85, maxBucket = 48)
      tm = mark("neardedup", tm)
      val bench = t("documents")
        .filter(col("doc_id") % 25 === 0 && size(split(col("text"), " ")) >= 13)
        .select(array_join(slice(split(col("text"), " "), 1, 13), " ").as("gram"))
      val contaminated = Dedup.contaminatedDocs(s3, "doc_id", "page_text", bench)
      val clean = s3.join(contaminated, Seq("doc_id"), "left_anti").localCheckpoint(true)
      tm = mark("decontaminate+checkpoint", tm)
      val deduped = Dedup.dedupLines(clean, "doc_id", "page_text")
      val n = deduped.select(col("doc_id"), col("page_text")).as[(Long, String)]
        .mapPartitions(_.map { case (i, txt) =>
          val (_, nTok, sha) = Extraction.extractTextStats(
            PageRow(i.toString, null, Array.empty[Byte], Redact.redactPII(txt), ""))
          (i, nTok.toLong, sha)
        }).toDF("doc_id", "n_tokens", "text_sha256").count()
      tm = mark(s"linededup+redact+stats(n=$n)", tm)
    }

    spark.stop()
  }
}
