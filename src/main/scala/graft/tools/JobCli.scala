package graft.tools

import graft.engine.Extraction
import graft.jobs.ExtractJob
import org.apache.spark.sql.SparkSession

/** CLI for the resumable bucketed extraction job.
  *
  * Usage: runMain graft.tools.JobCli <outDir> [nDocs] [nBuckets] [failAtBucket]
  * Re-running with the same outDir resumes from committed lineage.
  */
object JobCli {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(sys.error("usage: JobCli <outDir> [nDocs] [nBuckets] [failAt]"))
    val nDocs = args.lift(1).map(_.toLong).getOrElse(2000L)
    val nBuckets = args.lift(2).map(_.toInt).getOrElse(8)
    val failAt = args.lift(3).map(_.toInt)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val done = ExtractJob.committedBuckets(spark, outDir)
    println(s"[job] committed buckets on start: ${done.toSeq.sorted.mkString(",")}")
    val rows = ExtractJob.run(spark, Extraction.syntheticPages(spark, nDocs, 16), outDir, nBuckets, failAt)
    rows.foreach(r => println(
      s"[job] bucket=${r.bucket} rows=${r.n_rows} tokens=${r.n_tokens} checksum=${r.checksum} wall_ms=${r.wall_ms}"))
    val audit = ExtractJob.audit(spark, outDir)
    val bad = audit.filter("NOT (rows_match AND checksum_match)").count()
    println(s"[job] audit: ${audit.count()} buckets, $bad mismatched")
    spark.stop()
  }
}
