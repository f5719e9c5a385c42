package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-stress data derivation: replicate the driver's sf0.1
  * star schema `mult`× with key offsets, producing an "sf1" (or larger)
  * directory the full query contract and Bench can run against unchanged.
  * NOT an oracle surface — correctness stays pinned on the driver's own
  * tables at sf0.01; this exists because every shuffle-bearing plan was
  * only ever measured at sf0.1, and exchange costs, AQE decisions and skew
  * behavior only become visible at 10×+ input.
  *
  * Shapes are kept realistic for the dedup stages rather than naively
  * cloned (documents replica semantics, web-corpus realism):
  *   - replica 0 is the original corpus byte-for-byte;
  *   - replica 1 of every 5th doc is an EXACT duplicate (≈2% of the corpus,
  *     the url/content-dedup target);
  *   - replicas 1–2 otherwise append one token (near-dups: high Jaccard,
  *     shared line prefixes — the minhash/simhash/line-dedup target);
  *   - replicas 3+ prefix two tokens (distinct content: token stream and
  *     8-token line grouping both shift).
  * Embeddings get a small deterministic per-replica perturbation, so the
  * ANN corpus grows 10× with preserved cluster structure. Foreign keys
  * (orders→customer, lineitem→part/supplier) are offset consistently, so
  * every join query sees a coherent 10× schema. Dimension tables region /
  * nation stay as-is (they are dimensions; joins fan out naturally).
  *
  * Usage: runMain graft.tools.ScaleData [outDir] [mult]
  * (defaults target/scaledata/sf1, 10; source fixed at the driver's sf0.1)
  */
object ScaleData {
  val Offset = 10000000L // replica k adds k*Offset to every entity key

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")
    val outDir = args.headOption.getOrElse("target/scaledata/sf1")
    val mult = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, srcDir, outDir, mult)
    spark.stop()
  }

  def generate(spark: SparkSession, srcDir: String, outDir: String, mult: Int): Unit = {
    require(mult >= 1 && mult * Offset < Long.MaxValue / 1000, s"mult $mult out of range")
    def src(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$t.parquet")
    val ks = spark.range(mult).toDF("__k")
    def replicate(t: String, keys: String*): Unit = {
      val df = src(t).crossJoin(ks)
      val out = keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + col("__k") * Offset))
        .drop("__k")
      write(out, t)
    }

    // dimensions pass through
    write(src("region"), "region")
    write(src("nation"), "nation")
    // fact/entity tables: consistent key offsets
    replicate("customer", "c_custkey")
    replicate("supplier", "s_suppkey")
    replicate("part", "p_partkey")
    replicate("orders", "o_orderkey", "o_custkey")
    replicate("lineitem", "l_orderkey", "l_partkey", "l_suppkey")
    replicate("events", "event_id", "user_id")

    // documents: replica text semantics per the object contract
    val kc = col("__k")
    val textExpr =
      when(kc === 0, col("text"))
        .when(kc === 1 && col("doc_id") % 5 === 0, col("text")) // exact dup plant
        .when(kc <= 2, concat(col("text"), lit(" rep"), kc)) // near-dup
        .otherwise(concat(lit("r"), kc, lit(" variant "), col("text")))
    write(
      src("documents").crossJoin(ks)
        .select(
          (col("doc_id") + kc * Offset).as("doc_id"),
          textExpr.as("text"),
          col("lang"), col("source"),
          length(textExpr).cast("long").as("n_chars")),
      "documents")

    // embeddings: deterministic small per-replica, per-dimension shift
    write(
      src("embeddings").crossJoin(ks)
        .select(
          (col("vec_id") + kc * Offset).as("vec_id"),
          // replica 0 passes the source column through UNTOUCHED: adding a
          // zeroed delta would still canonicalize -0.0f to +0.0f (and NaN
          // payloads), breaking the bit-exact replica-0 contract
          when(kc === 0, col("embedding"))
            .otherwise(transform(col("embedding"), (x, d) =>
              (x + ((kc * 31 + d) % 7 - lit(3)).cast("float") * lit(0.003f)).cast("float")))
            .as("embedding"),
          col("label")),
      "embeddings")
  }
}
