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
    val sorted = df
      .select(col(idCol).cast("long").as("id"),
        coalesce(col(tokenCol).cast("long"), lit(0L)).as("toks"))
      .repartitionByRange(col("id"))
      .sortWithinPartitions("id")
      .as[(Long, Long)]
      .localCheckpoint(true) // pin partitioning: both passes must agree
    val partSums = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach { case (_, t) =>
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
    sorted
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var running = bOffsets.value(pid)
        it.map { case (id, t) =>
          val start = running
          running = Math.addExact(running, t)
          val end = running
          val shardStart = start / budget
          val shardEnd = Math.max(end - 1, start) / budget
          (id, t, start, shardStart, shardEnd,
            if (shardEnd > shardStart) 1 else 0)
        }
      }
      .toDF(idCol, "n_tokens", "start_pos", "shard_start", "shard_end",
        "spans_boundary")
  }
}
