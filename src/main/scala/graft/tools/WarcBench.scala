package graft.tools

import graft.engine.{Extraction, PageRow}
import org.apache.spark.sql.{SparkSession, functions => F}

/** WARC ingest throughput: stage a synthetic crawl as per-record-gzip WARC
  * archives once, then measure (a) the container parse alone and (b) the
  * full parse→extract path, at the parallelism given by SPARK_GRAFT_CPUS.
  * Run at two core counts for the q75 scaling evidence (same two-level
  * protocol as ScalingBench — the staged archives are identical bytes, so
  * the work is identical at both levels).
  *
  * Usage: SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.tools.WarcBench 60000"
  */
object WarcBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(60000L)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // stage once, reuse across invocations (the two-core-count protocol
    // must parse IDENTICAL bytes at both levels)
    val dir = s"/tmp/graft_warc_stage_${nDocs}_$nFiles"
    val done = new java.io.File(dir, "_STAGED")
    if (!done.exists()) {
      val pages = Extraction.syntheticPages(spark, nDocs, nFiles)
        .select(F.col("url"), F.col("warc_ts"), F.col("html"))
      val written = graft.sources.Warc.write(pages, dir)
      require(written.map(_._2).sum == nDocs, "staging lost records")
      java.nio.file.Files.writeString(done.toPath, "ok")
    }
    val bytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).map(_.length()).sum
    val nStagedFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".warc.gz"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def minOf2(f: => Long): (Long, Double) = {
      val a = time(f); val b = time(f)
      (a._1, math.min(a._2, b._2))
    }
    // container parse alone: count forces every record through the parser
    val (nParsed, parseSec) = minOf2(graft.sources.Warc.read(spark, dir).count())
    require(nParsed == nDocs, s"parsed $nParsed of $nDocs")
    // parse -> extract: the q75 path without the oracle projection
    val (nExtracted, exSec) = minOf2 {
      graft.sources.Warc.read(spark, dir)
        .select(F.col("url"), F.col("warc_ts"), F.col("html"),
          F.lit("").as("text"), F.lit("").as("lang"))
        .as[PageRow]
        .mapPartitions(_.map(p => Extraction.extractOne(p).text_sha256))
        .filter(_ != null).count()
    }
    require(nExtracted == nDocs)
    println(
      f"""{"metric":"warc_ingest","docs":$nDocs,"files":$nStagedFiles,"gz_bytes":$bytes,"cores":$cpus,""" +
        f""""parse_docs_per_sec":${nDocs / parseSec}%.1f,"parse_mb_per_sec":${bytes / 1e6 / parseSec}%.1f,""" +
        f""""extract_docs_per_sec":${nDocs / exSec}%.1f,"parse_sec":$parseSec%.2f,"extract_sec":$exSec%.2f}""")
    spark.stop()
  }
}
