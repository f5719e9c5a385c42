package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** BPE training + application (q89/q90): merge semantics, the Sennrich
  * fixture, the distributed trainer, and the replace-chain equivalence the
  * q90 oracle depends on.
  */
class BpeSpec extends AnyFunSuite {

  test("applyMerge: leftmost-first non-overlapping, including same-symbol runs") {
    assert(Bpe.applyMerge(IndexedSeq("a", "n", "a", "n"), "a", "n") == IndexedSeq("an", "an"))
    assert(Bpe.applyMerge(IndexedSeq("a", "a", "a"), "a", "a") == IndexedSeq("aa", "a"))
    assert(Bpe.applyMerge(IndexedSeq("b", "a", "n"), "a", "n") == IndexedSeq("b", "an"))
    assert(Bpe.applyMerge(IndexedSeq("x"), "a", "n") == IndexedSeq("x"))
  }

  test("encodeWord: merges apply in training order") {
    val merges = IndexedSeq(("t", "h"), ("th", "e"))
    assert(Bpe.encodeWord("the", merges) == IndexedSeq("the"))
    assert(Bpe.encodeWord("then", merges) == IndexedSeq("the", "n"))
    assert(Bpe.encodeWord("th", merges) == IndexedSeq("th"))
  }

  test("trainMerges: the Sennrich toy corpus learns (e,s) then (es,t) first") {
    // Sennrich et al. 2016 §3.2 example vocabulary: low×5, lower×2,
    // newest×6, widest×3 — the classic first merges are (e,s) 9, (es,t) 9.
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = Seq(
      Seq.fill(5)("low"), Seq.fill(2)("lower"),
      Seq.fill(6)("newest"), Seq.fill(3)("widest"))
      .flatten.mkString(" ")
    val merges = Bpe.trainMerges(Seq(docs).toDF("text"), "text", 2)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq((0, "e", "s", 9L), (1, "es", "t", 9L)))
  }

  test("trainMerges: deterministic tie-break and early exhaustion") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // only one word "ab": pair (a,b) once; after merging, no pairs remain
    val merges = Bpe.trainMerges(Seq("ab").toDF("text"), "text", 5).collect()
    assert(merges.length == 1)
    assert((merges(0).getString(1), merges(0).getString(2)) == ("a", "b"))
  }

  test("pairCounts: duplicate pairs inside one word each count") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // "aaa" ×2 occurrences: pair (a,a) twice per occurrence = 4
    val words = Bpe.symbolize(Bpe.wordCounts(Seq("aaa aaa b").toDF("text"), "text"))
    val pc = Bpe.pairCounts(words).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(pc == Map(("a", "a") -> 4L))
  }

  test("tokenCounts: per-doc subword budget under pinned merges") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val merges = IndexedSeq(("t", "h"), ("th", "e"))
    val out = Bpe.tokenCounts(
      Seq((1L, "the theme x"), (2L, "")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the→[the]=1, theme→[the,m,e]=3, x→[x]=1
    assert(out.toSeq == Seq((1L, 3L, 5L), (2L, 0L, 0L)))
  }

  /** The q90 oracle replays each merge as TWO chained left-to-right
    * `replace(" l r ", " lr ")` passes over the space-joined symbol
    * string. Exhaustively verify that equals the engine's applyMerge for
    * every l != r word shape up to length 10 over a 2-symbol alphabet —
    * the overlap/adjacency space where single-pass replace diverges.
    */
  test("oracle equivalence: double replace == applyMerge for l != r") {
    def viaReplace(syms: IndexedSeq[String], l: String, r: String): IndexedSeq[String] = {
      val s0 = syms.mkString(" ", " ", " ")
      val pat = s" $l $r "
      val rep = s" $l$r "
      val once = s0.replace(pat, rep)
      val twice = once.replace(pat, rep)
      twice.trim.split(" ").toIndexedSeq.filter(_.nonEmpty)
    }
    val alphabet = IndexedSeq("l", "r")
    for (len <- 1 to 10; mask <- 0 until (1 << len)) {
      val syms = (0 until len).map(i => alphabet((mask >> i) & 1)).toIndexedSeq
      val expect = Bpe.applyMerge(syms, "l", "r")
      val got = viaReplace(syms, "l", "r")
      assert(got == expect, s"diverged on ${syms.mkString}")
    }
  }

  test("wordCounts/pairCounts plans: one shuffle each, map-side partials") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val wc = Bpe.wordCounts(Seq("a b a").toDF("text"), "text")
    val plan = wc.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
  }

  test("vocabIds: digits 0-9, letters 10-35, merge outputs at 36+step") {
    val merges = IndexedSeq(("t", "h"), ("th", "e"))
    val v = Bpe.vocabIds(merges)
    assert(v("0") == 0 && v("9") == 9)
    assert(v("a") == 10 && v("z") == 35)
    assert(v("th") == 36 && v("the") == 37)
    assert(v.size == 38)
    val dup = IndexedSeq(("a", "bc"), ("ab", "c")) // both outputs 'abc'
    intercept[IllegalArgumentException](Bpe.vocabIds(dup))
  }

  test("encodeIds: hand-checked id sequences, empty and digit-mixed docs") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val merges = IndexedSeq(("t", "h"), ("th", "e"))
    val df = Seq(
      (1L, "the that a3b"), // the->[37], that->[36,10,29], a3b->[10,3,11]
      (2L, "...!!!"),       // no alnum tokens
      (3L, "THE THE")       // case-folds; repeats exercise the memo
    ).toDF("doc_id", "text")
    val got = Bpe.encodeIds(df, "doc_id", "text", merges)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got(0) == ((1L, 7L, "37 36 10 29 10 3 11")))
    assert(got(1) == ((2L, 0L, "")))
    assert(got(2) == ((3L, 2L, "37 37")))
  }

  test("encodeIds agrees with tokenCounts and is partitioning-invariant") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val merges = IndexedSeq(("t", "h"), ("a", "n"), ("an", "d"))
    val docs = (0L until 40L)
      .map(i => (i, s"the band and th$i hand stand ${i % 7}"))
    val one = Bpe.encodeIds(docs.toDF("doc_id", "text").repartition(1),
      "doc_id", "text", merges).orderBy("doc_id").collect().toSeq
    val many = Bpe.encodeIds(docs.toDF("doc_id", "text").repartition(13),
      "doc_id", "text", merges).orderBy("doc_id").collect().toSeq
    assert(one == many)
    val counts = Bpe.tokenCounts(docs.toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(_.getLong(2)).toSeq
    assert(one.map(_.getLong(1)) == counts)
    one.foreach { r =>
      assert(r.getString(2).split(" ").length.toLong == r.getLong(1))
    }
  }
}
