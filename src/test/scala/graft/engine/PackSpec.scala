package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Sequence packing (Pack.chunkAssign): the two-phase global cumsum must
  * reproduce the sequential reference exactly regardless of input
  * partitioning, and the chunk arithmetic must handle the boundary cases
  * (exact fills, zero-token docs, multi-shard spans).
  */
class PackSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def reference(toks: Seq[(Long, Long)], budget: Long) = {
    var pos = 0L
    toks.sortBy(_._1).map { case (id, t) =>
      val start = pos
      pos += t
      val end = pos
      val ss = start / budget
      val se = math.max(end - 1, start) / budget
      (id, t, start, ss, se, if (se > ss) 1 else 0)
    }
  }

  test("matches the sequential reference on random sizes across partitionings") {
    import spark.implicits._
    val data = (0 until 500).map(i => (i.toLong, (i * 37 % 97).toLong))
    val want = reference(data, 100L)
    for (parts <- Seq(1, 3, 17)) {
      val df = data.toDF("id", "toks").repartition(parts)
      val got = Pack.chunkAssign(df, "id", "toks", 100L)
        .as[(Long, Long, Long, Long, Long, Int)].collect().sortBy(_._1).toSeq
      assert(got == want, s"parts=$parts")
    }
  }

  test("boundary cases: exact fill, zero tokens, multi-shard span") {
    import spark.implicits._
    // doc 0 fills shard 0 exactly; doc 1 has zero tokens AT the cut and
    // must sit in shard 1 (its start), not span; doc 2 spans shards 1-3
    val df = Seq((0L, 10L), (1L, 0L), (2L, 25L), (3L, 1L))
      .toDF("id", "toks").repartition(2)
    val got = Pack.chunkAssign(df, "id", "toks", 10L)
      .as[(Long, Long, Long, Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 10L, 0L, 0L, 0L, 0),
      (1L, 0L, 10L, 1L, 1L, 0),
      (2L, 25L, 10L, 1L, 3L, 1),
      (3L, 1L, 35L, 3L, 3L, 0)))
  }

  test("null token counts pack as zero; id order is the stream order") {
    import spark.implicits._
    val df = Seq((2L, Some(5L)), (0L, None), (1L, Some(7L)))
      .toDF("id", "toks")
    val got = Pack.chunkAssign(df, "id", "toks", 4L)
      .as[(Long, Long, Long, Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 0L, 0L, 0L, 0L, 0),
      (1L, 7L, 0L, 0L, 1L, 1),
      (2L, 5L, 7L, 1L, 2L, 1)))
  }

  test("rejects budget < 1 and negative token counts") {
    import spark.implicits._
    val df = Seq((0L, 5L)).toDF("id", "toks")
    intercept[IllegalArgumentException](Pack.chunkAssign(df, "id", "toks", 0L))
    val bad = Seq((0L, -3L)).toDF("id", "toks")
    val e = intercept[Exception](Pack.chunkAssign(bad, "id", "toks", 8L).collect())
    assert(e.getMessage != null)
  }

  test("contextWindows: overlap, tail clamp, full coverage") {
    import spark.implicits._
    // 10 tokens, window 4, stride 3 → starts 0,3,6,9; tail short
    val df = Seq((7L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Pack.contextWindows(df, "doc_id", "text", window = 4, stride = 3)
      .orderBy("win_idx")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (7L, 0, 0, 4, "t0 t1 t2 t3"),
      (7L, 1, 3, 7, "t3 t4 t5 t6"),
      (7L, 2, 6, 10, "t6 t7 t8 t9"),
      (7L, 3, 9, 10, "t9")))
    // no token dropped, consecutive windows overlap by window - stride
    assert(got.sliding(2).forall {
      case Seq(a, b) => b._3 == a._3 + 3 && b._3 < a._4; case _ => true
    })
  }

  test("contextWindows: stride == window tiles without overlap; short doc = one window") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f"), (2L, "x")).toDF("doc_id", "text")
    val got = Pack.contextWindows(df, "doc_id", "text", window = 3, stride = 3)
      .orderBy("doc_id", "win_idx")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0, 0, 3, "a b c"), (1L, 1, 3, 6, "d e f"),
      (2L, 0, 0, 1, "x")))
  }

  test("contextWindows: rejects bad window/stride; plan is a single narrow stage") {
    import spark.implicits._
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Pack.contextWindows(df, "doc_id", "text", 0, 1))
    intercept[IllegalArgumentException](
      Pack.contextWindows(df, "doc_id", "text", 4, 5))
    val plan = Pack.contextWindows(df, "doc_id", "text", 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"contextWindows must not shuffle:\n$plan")
  }

  test("seededShuffle: bijective keys, partition-invariant, seed-sensitive") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val ids = (0L until 500L).toDF("doc_id")
    val one = Pack.seededShuffle(ids.repartition(1), "doc_id", 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val many = Pack.seededShuffle(ids.repartition(13), "doc_id", 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(one == many, "order must not depend on input partitioning")
    assert(one.map(_._2).distinct.length == 500, "keys must be collision-free")
    assert(one.map(_._2) == one.map(_._2).sorted, "output must be key-ordered")
    val other = Pack.seededShuffle(ids, "doc_id", 43L)
      .collect().map(_.getLong(0)).toSeq
    assert(one.map(_._1) != other, "a different seed must give a different order")
    // exactly the one range exchange any total order needs
    val plan = Pack.seededShuffle(ids.repartition(4), "doc_id", 42L)
      .queryExecution.executedPlan.toString
    assert("rangepartitioning".r.findAllIn(plan.toLowerCase).size >= 1, plan)
  }

  test("shardAssign: exact ranks, exact shard balance, replay of the shuffle order") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val ids = (0L until 500L).toDF("doc_id")
    val out = Pack.shardAssign(ids.repartition(7), "doc_id", 42L, 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._3)
    // ranks are a permutation of 0..n-1
    assert(out.map(_._3).toSeq == (0L until 500L).toSeq)
    // rank order IS key order (the seeded shuffle order)
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq)
    assert(out.map(_._1).toSeq ==
      Pack.seededShuffle(ids, "doc_id", 42L).collect().map(_.getLong(0)).toSeq)
    // exact balance: 7 full shards of 64 + a final shard of 52
    val sizes = out.groupBy(_._4).toSeq.sortBy(_._1).map(_._2.length)
    assert(sizes == Seq(64, 64, 64, 64, 64, 64, 64, 52))
    assert(out.forall { case (_, _, r, s, p) => s == r / 64 && p == r % 64 })
    // partition-invariant
    val again = Pack.shardAssign(ids.repartition(2), "doc_id", 42L, 64L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._2)
    assert(again.map(_._1).toSeq == out.map(_._1).toSeq)
    intercept[IllegalArgumentException](Pack.shardAssign(ids, "doc_id", 42L, 0L))
  }

  test("encodeIds -> contextWindows composes shuffle-free (the q102 shape)") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq((1L, "the cat the hat"), (2L, "a band and a hand"))
      .toDF("doc_id", "text")
    val ids = Bpe.encodeIds(df, "doc_id", "text",
      IndexedSeq(("t", "h"), ("a", "n")))
    val windows = Pack.contextWindows(ids, "doc_id", "token_ids", 4, 2)
    val plan = windows.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"the composed tokenize->window pipeline must not shuffle:\n$plan")
    // windows reassemble to the full id sequence (stride-aligned prefix)
    val byDoc = windows.collect().groupBy(_.getLong(0))
    byDoc.values.foreach { rows =>
      val full = rows.sortBy(_.getInt(1)).map(_.getString(4).split(" ").take(2))
        .flatten.toSeq
      val tail = rows.maxBy(_.getInt(1)).getString(4).split(" ").drop(2).toSeq
      val direct = Bpe.encodeIds(df, "doc_id", "text",
        IndexedSeq(("t", "h"), ("a", "n")))
        .filter(col("doc_id") === rows.head.getLong(0))
        .collect().head.getString(2).split(" ").toSeq
      assert(full ++ tail == direct)
    }
  }
}
