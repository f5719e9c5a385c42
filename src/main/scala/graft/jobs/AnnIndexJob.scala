package graft.jobs

import graft.engine.Similarity
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** ANN index build job: fit the IVF coarse quantizer once, persist it, and
  * write the corpus bucketed by cell id — queries then load centroids (KBs)
  * and scan only their probed cells. This moves the quantizer fit out of
  * the query path (an inline fit at 100-TB scale would be a full ML pass
  * per invocation); the fit itself is a deterministic driver-side k-means
  * over a take-ordered sample (Similarity.localKMeans).
  *
  * Layout: `out/centroids/` (cell, centroid) parquet; `out/cells/`
  * (vec_id, embedding) parquet partitioned by cell — partition pruning
  * turns an nProbe-cell query into an nProbe-partition scan.
  */
object AnnIndexJob {

  /** Cell count as a function of corpus size — the classic IVF sizing rule
    * nCells ≈ √N (balances cells-scanned-per-probe against per-cell scan
    * cost), clamped to [4, 4096]. The UPPER clamp is a driver-fit
    * feasibility bound, not an ideal: the quantizer is a single-threaded
    * driver-side Lloyd's over the sample, O(sample × k × dim × iters) —
    * at 4096 cells × 131k sample it is minutes of driver CPU; the √N
    * ideal for 1e12 rows (≈1M cells) would be days and belongs to a
    * distributed or hierarchical (second-level) quantizer, out of scope
    * here. At the clamp a 1e12-row corpus gets ~244M vectors/cell —
    * coarse but functional with partition pruning; the sandbox's 2k
    * vectors get 45.
    */
  def autoCells(corpusSize: Long): Int =
    math.max(4L, math.min(4096L, math.round(math.sqrt(math.max(0L, corpusSize).toDouble)))).toInt

  /** Quantizer sample size for a cell count: ≥32 sample vectors per cell
    * (below that, Lloyd's + the balance passes fit noise), floored at the
    * legacy 2048; the 131072 cap pairs with autoCells' 4096 clamp to keep
    * the driver-side fit in the minutes range.
    */
  def autoSampleCap(nCells: Int): Int =
    math.max(2048, math.min(1 << 17, 32 * nCells))

  /** [[build]] with size-derived quantizer parameters: one corpus count
    * chooses nCells ≈ √N and a matching sample cap.
    */
  def buildAuto(
      spark: SparkSession,
      corpus: Dataset[(Long, Array[Float])],
      outDir: String): Similarity.IvfIndex = {
    val cells = autoCells(corpus.count())
    build(spark, corpus, outDir, nCells = cells, sampleCap = autoSampleCap(cells))
  }

  def build(
      spark: SparkSession,
      corpus: Dataset[(Long, Array[Float])],
      outDir: String,
      nCells: Int = 16,
      sampleCap: Int = 2048): Similarity.IvfIndex = {
    import spark.implicits._
    val index = Similarity.buildIvfIndexLocal(corpus, nCells, sampleCap)
    val bc = spark.sparkContext.broadcast(index.centroids)
    index.centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq.toDS()
      .toDF("cell", "centroid")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/centroids")
    corpus.map { case (id, v) =>
        (Similarity.nearestCell(v, bc.value), id, v) // the shared cell rule
      }
      .toDF("cell", "vec_id", "embedding")
      // cluster by the partition column before the write (guide §6): one
      // file per cell instead of tasks × cells small files — a probed
      // query opens nProbe files, not nProbe × tasks
      .repartition(nCells, col("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(s"$outDir/cells")
    index
  }

  def loadCentroids(spark: SparkSession, outDir: String): Similarity.IvfIndex = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$outDir/centroids")
      .select(col("cell").cast("int"), col("centroid"))
      .as[(Int, Array[Float])].collect().sortBy(_._1)
    Similarity.IvfIndex(rows.map(_._2))
  }

  /** Query the PERSISTED index with partition pruning — the 100-TB read
    * path: load centroids (KBs), compute each query's probe cells, and scan
    * `cells/` with `col("cell").isin(probed)`. `cell` is the parquet
    * partition column, so the filter resolves at planning time
    * (PartitionFilters in the scan node) and only nProbe cells' files are
    * ever opened — the difference between reading nProbe/nCells of the
    * corpus and all of it. Results are identical to the inline full-scan
    * [[Similarity.ivfTopK]] over the same index: non-probed cells
    * contribute nothing there either.
    */
  def queryIndex(
      spark: SparkSession,
      outDir: String,
      queries: Array[(Long, Array[Float])],
      k: Int,
      nProbe: Int): Dataset[Similarity.Neighbor] = {
    val index = loadCentroids(spark, outDir)
    // ONE probe computation feeds both the pruning filter and the scorer —
    // two independent computations could silently diverge
    val probes = Similarity.probeAssignments(queries, index.centroids, nProbe)
    val probed = probes.keys.toSeq.sorted
    val cells = spark.read.parquet(s"$outDir/cells")
      .filter(col("cell").isin(probed.map(Integer.valueOf): _*))
    Similarity.ivfTopKIndexed(cells, probes, k)
  }

  // query-surface cache: one quantizer per corpus key per JVM, so repeated
  // queries (bench trials, interactive sessions) never refit
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Similarity.IvfIndex]()

  def cachedIndex(key: String, corpus: Dataset[(Long, Array[Float])], nCells: Int = 16): Similarity.IvfIndex =
    cache.computeIfAbsent(key, _ => Similarity.buildIvfIndexLocal(corpus, nCells))

  // persisted-layout cache: one on-disk index build per corpus key per JVM;
  // the value is the index dir. Lives under java.io.tmpdir — a bench/oracle
  // surface cache, not a production artifact (production calls build()
  // against a durable path itself).
  private val builtDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def cachedIndexDir(key: String, spark: SparkSession,
      corpus: Dataset[(Long, Array[Float])], nCells: Int = 16): String =
    builtDirs.computeIfAbsent(key, { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft_ann_index").toString
      build(spark, corpus, dir, nCells)
      dir
    })
}
