package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one driver-contract query in isolation:
  * runMain graft.tools.QueryCli <name> [sfDir] [trials]
  */
object QueryCli {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val trials = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (0 until trials).foreach { t =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[querycli] $name trial $t: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    // optional parquet dump for ad-hoc oracle comparison
    sys.env.get("SPARK_GRAFT_DUMP").foreach { out =>
      fn(spark, sfDir).write.mode("overwrite").parquet(s"$out/$name")
      println(s"[querycli] dumped to $out/$name")
    }
    spark.stop()
  }
}
