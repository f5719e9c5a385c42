package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-sequence packing: assign each document a position in the
  * concatenated token stream and the fixed-size training shard(s) it lands
  * in — the "concat and chunk" layout LLM pipelines feed sequence writers
  * with (documents are concatenated in a global deterministic order and
  * the stream is cut every `budget` tokens; a document may span a cut).
  *
  * Output columns per input row:
  *   - `start_pos`  — tokens preceding this document in the stream
  *   - `shard_start` / `shard_end` — first/last budget-sized chunk the
  *     document overlaps (`start_pos / budget`, `(end-1) / budget`; a
  *     zero-token document stays in its start chunk)
  *   - `spans_boundary` — 1 iff the document crosses a chunk cut
  *
  * Scale shape — the naive formulation is a global `sum() OVER (ORDER BY
  * id)` window, which Spark executes as a SINGLE task holding the whole
  * corpus (no PARTITION BY → one partition). Instead, the classic
  * two-phase scan:
  *   1. range-repartition by id + in-partition sort (one exchange, the
  *     same shuffle any global ordering needs), then MATERIALIZE via
  *     localCheckpoint — the range partitioner samples boundaries, so
  *     both passes must see the same partitioning;
  *   2. per-partition token sums → driver (numPartitions longs — a
  *     justified driver collect, same class as the gradient combines);
  *   3. prefix offsets broadcast back; each partition emits its rows with
  *     a running local sum + its global offset. Both passes are linear
  *     and parallel; nothing corpus-sized ever sits in one task.
  *
  * Determinism: positions depend only on (id order, token counts); ANSI
  * mode makes a Long overflow of the running sum THROW, not wrap.
  *
  * Contract: `idCol` castable to long and globally unique (the stream
  * order); `tokenCol` castable to long, ≥ 0, null = 0.
  */
object Pack {

  def chunkAssign(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"chunkAssign: budget must be >= 1, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    // one physical range exchange drives both passes (see [[shardAssign]]:
    // toRdd pins the sampled boundaries and reuses the shuffle files, so
    // the old eager localCheckpoint is unnecessary)
    val sorted = df
      .select(col(idCol).cast("long").as("id"),
        coalesce(col(tokenCol).cast("long"), lit(0L)).as("toks"))
      .repartitionByRange(col("id"))
      .sortWithinPartitions("id")
    val rdd = sorted.queryExecution.toRdd // (id, toks) InternalRows
    val partSums = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach { row =>
          val t = row.getLong(1)
          require(t >= 0, s"chunkAssign: negative token count $t")
          s = Math.addExact(s, t)
        }
        Iterator.single((pid, s))
      }
      .collect() // numPartitions (pid, sum) pairs
      .sortBy(_._1)
      .map(_._2)
    val offsets = partSums.scanLeft(0L)(Math.addExact).dropRight(1)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    spark.createDataset(
      rdd.mapPartitionsWithIndex { (pid, it) =>
        var running = bOffsets.value(pid)
        it.map { row =>
          // loud on a null id (the typed decode this path replaced threw;
          // InternalRow.getLong would silently read 0)
          if (row.isNullAt(0)) throw new IllegalArgumentException(
            "chunkAssign: null id (idCol must be non-null)")
          val id = row.getLong(0)
          val t = row.getLong(1)
          val start = running
          running = Math.addExact(running, t)
          val end = running
          val shardStart = start / budget
          val shardEnd = Math.max(end - 1, start) / budget
          (id, t, start, shardStart, shardEnd,
            if (shardEnd > shardStart) 1 else 0)
        }
      })
      .toDF(idCol, "n_tokens", "start_pos", "shard_start", "shard_end",
        "spans_boundary")
  }

  /** Within-document sliding context windows — the OTHER training layout
    * (vs [[chunkAssign]]'s cross-document stream packing): each document's
    * whitespace-token sequence is cut into overlapping windows of `window`
    * tokens every `stride` tokens (window k covers tokens
    * `[k*stride, min(k*stride+window, n))`; every k with `k*stride < n`
    * emits, so the tail window may be short but no token is dropped and
    * consecutive windows overlap by `window - stride` tokens — the
    * standard long-document training recipe).
    *
    * Output: one row per (document, window) with `win_idx`, `start_tok`,
    * `end_tok` (exclusive), and the window text.
    *
    * Scale shape: entirely built-in Catalyst — split once, then
    * `posexplode(transform(sequence(...)))` slices the cached token array;
    * a narrow codegen stage with no shuffle and no UDF. Output size is
    * `~n/stride` rows per document — the caller chooses the expansion
    * factor explicitly via `stride`.
    */
  def contextWindows(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"contextWindows: window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"contextWindows: stride must be in [1, window], got $stride")
    val toks = split(col(textCol), " ")
    val n = size(toks)
    // number of windows: ceil(n / stride) (n=0 never occurs: split("")
    // yields [""], n=1)
    val nWin = ceil(n.cast("double") / stride).cast("int")
    df.select(col(idCol).cast("long").as("doc_id"), toks.as("__toks"),
        n.as("__n"), nWin.as("__nw"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("__nw") - 1), k =>
          struct(
            (k * stride).cast("int").as("start_tok"),
            least(k * stride + window, col("__n")).cast("int").as("end_tok"),
            array_join(slice(col("__toks"), k * stride + 1, lit(window)), " ")
              .as("win_text")))).as(Seq("win_idx", "__w")))
      .select(col("doc_id"), col("win_idx").cast("int").as("win_idx"),
        col("__w.start_tok").as("start_tok"), col("__w.end_tok").as("end_tok"),
        col("__w.win_text").as("win_text"))
  }

  /** Deterministic seeded global shuffle — the reproducible training-data
    * order: `shuffle_key = rotl64((id + seed)·A, 32)·A` wrapped to 64 bits
    * (see [[graft.functions.ShuffleKey64]] for why the rotate-multiply
    * sandwich: one multiply-add is linear in the seed and would not
    * actually reshuffle), sorted ascending. Unlike `rand()`, the same seed
    * always yields the same order at any parallelism and across retries —
    * resumable data loading — and the key replays in plain SQL. Every step
    * is a bijection mod 2^64, so keys never collide and the order is total
    * with no tiebreak. Scale shape: ONE range exchange — the unavoidable
    * cost of any total order; no window, no single-partition stage.
    */
  def seededShuffle(df: DataFrame, idCol: String, seed: Long): DataFrame =
    df.withColumn("shuffle_key",
        graft.functions.GraftFunctions.shuffle_key64(col(idCol).cast("long"), seed))
      .orderBy("shuffle_key")

  /** Shard layout for the seeded training order — [[seededShuffle]]'s
    * write-side complement: every document gets its global rank in the
    * shuffled order and the contiguous shard that rank lands in
    * (`shard = rank / shardSize`, `pos_in_shard = rank % shardSize`), so
    * shard files read back in (shard, pos) order replay the epoch's exact
    * shuffle order, every shard holds exactly `shardSize` documents
    * except the last, and a loader can address any position without
    * scanning (resume mid-epoch = seek to rank). Hash-mod sharding can't
    * give any of that: residue classes interleave the order away and
    * balance only in expectation.
    *
    * Scale shape: the global rank is the [[chunkAssign]] two-phase scan
    * over the shuffle key — range-repartition + in-partition sort (the
    * ONE exchange any total order costs), per-partition COUNTS to the
    * driver (numPartitions longs), offsets broadcast back, ranks emitted
    * by a running local counter. The naive
    * `row_number() OVER (ORDER BY key)` window has no PARTITION BY and
    * would put the whole corpus in a single task.
    *
    * Contract: `idCol` castable to long, non-null, globally unique —
    * uniqueness + the key bijection make every rank deterministic with
    * no tiebreak.
    */
  def shardAssign(df: DataFrame, idCol: String, seed: Long,
      shardSize: Long): DataFrame = {
    require(shardSize >= 1, s"shardAssign: shardSize must be >= 1, got $shardSize")
    val spark = df.sparkSession
    import spark.implicits._
    // ONE physical instance of the range exchange drives BOTH rank passes:
    // `queryExecution.toRdd` pins the sampled range boundaries (the
    // RangePartitioner is built once on the driver for this RDD DAG) and
    // the emit pass re-reads the counts pass's shuffle files, so the
    // previous eager localCheckpoint — whose only job was to stop two
    // separate Dataset actions from re-sampling different boundaries — is
    // unnecessary, and the exchange stays a Tungsten columnar shuffle
    // (an RDD-level custom partitioner was measured slower: Tuple2 rows
    // pay Java serialization where UnsafeRow shuffles compact bytes).
    val sorted = df
      .select(col(idCol).cast("long").as("id"))
      .withColumn("key",
        graft.functions.GraftFunctions.shuffle_key64(col("id"), seed))
      .repartitionByRange(col("key"))
      .sortWithinPartitions("key")
    val rdd = sorted.queryExecution.toRdd // (id, key) InternalRows
    val partCounts = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        Iterator.single((pid, n))
      }
      .collect() // numPartitions (pid, count) pairs
      .sortBy(_._1)
      .map(_._2)
    val offsets = partCounts.scanLeft(0L)(Math.addExact).dropRight(1)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    spark.createDataset(
      rdd.mapPartitionsWithIndex { (pid, it) =>
        var rank = bOffsets.value(pid)
        it.map { row =>
          // loud on a null id (see chunkAssign)
          if (row.isNullAt(0)) throw new IllegalArgumentException(
            "shardAssign: null id (idCol must be non-null)")
          val id = row.getLong(0)
          val key = row.getLong(1)
          val r = rank
          rank += 1
          (id, key, r, r / shardSize, r % shardSize)
        }
      })
      .toDF(idCol, "shuffle_key", "rank", "shard", "pos_in_shard")
  }
}
