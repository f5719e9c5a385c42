package graft.streaming

import graft.engine.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming dedup: first arrival per content hash survives across
  * micro-batches; later duplicates (same batch or later batches) are dropped.
  */
class StreamDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("flatMapGroupsWithState drops duplicates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDedup.Keyed]
    val qname = "stream_dedup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = StreamDedup.firstArrivalPerKey(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(qname).start()
    try {
      input.addData(
        StreamDedup.Keyed("h1", 1, "a"),
        StreamDedup.Keyed("h2", 2, "b"),
        StreamDedup.Keyed("h1", 3, "a-dup-same-batch"))
      query.processAllAvailable()
      input.addData(
        StreamDedup.Keyed("h2", 4, "b-dup-later-batch"),
        StreamDedup.Keyed("h3", 5, "c"))
      query.processAllAvailable()
      val got = spark.table(qname).as[StreamDedup.Keyed].collect().sortBy(_.id)
      assert(got.map(r => (r.key, r.id)).toSeq == Seq(("h1", 1L), ("h2", 2L), ("h3", 5L)))
    } finally query.stop()
  }

  test("streaming minhash near-dup flags later near-copies across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 60 distinct tokens -> 58 distinct word-trigrams; editing the last
    // token perturbs only the tail shingles (true Jaccard ~0.95)
    val base = (0 until 60).map(i => f"word$i%02d").mkString(" ")
    val nearCopy = base.dropRight(6) + "edited"
    val distinct = (0 until 60).map(i => f"other$i%02d").mkString(" ")
    val input = MemoryStream[StreamDedup.Doc]
    val qname = "stream_neardup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = StreamDedup.nearDupVerdictsPerBand(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(qname).start()
    try {
      input.addData(StreamDedup.Doc(1, base), StreamDedup.Doc(2, distinct))
      query.processAllAvailable()
      input.addData(StreamDedup.Doc(3, nearCopy), StreamDedup.Doc(4, base))
      query.processAllAvailable()
      // reduce per-band verdicts to one per doc (any band may flag)
      val got = spark.table(qname).as[StreamDedup.NearDupVerdict].collect()
        .groupBy(_.id).view.mapValues(_.exists(_.is_near_dup)).toMap
      assert(got == Map(1L -> false, 2L -> false, 3L -> true, 4L -> true))
      // the exact copy matches a STORED member: the original (1) or the
      // flagged near-copy (3) — flagged docs join the state too so
      // near-dup chains A~B, B~C suppress C even when A!~C
      val matched4 = spark.table(qname).as[StreamDedup.NearDupVerdict].collect()
        .filter(v => v.id == 4 && v.is_near_dup).map(_.matched_id).toSet
      assert(matched4.nonEmpty && matched4.subsetOf(Set(1L, 3L)), s"matched $matched4")
    } finally query.stop()
  }

  test("streaming decontamination drops gram-sharing docs, parity with batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Set("alpha beta gamma")
    val docs = Seq(
      StreamDedup.Doc(1, "alpha beta gamma delta"), // contaminated
      StreamDedup.Doc(2, "x alpha\nbeta  gamma y"), // wrapped/mangled — still caught
      StreamDedup.Doc(3, "beta gamma alpha clean"), // same words, different order
      StreamDedup.Doc(4, "unrelated text entirely"))
    val input = MemoryStream[StreamDedup.Doc]
    val qname = "stream_decontam_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = StreamDedup.decontaminate(input.toDS(), bench, n = 3)
      .writeStream.outputMode("append").format("memory").queryName(qname).start()
    try {
      input.addData(docs: _*)
      query.processAllAvailable()
      val kept = spark.table(qname).as[StreamDedup.Doc].collect().map(_.id).toSet
      assert(kept == Set(3L, 4L))
      // parity: the batch operator flags exactly the complement
      val flagged = graft.engine.Dedup.contaminatedDocs(
        docs.map(d => (d.id, d.text)).toDF("id", "text"), "id", "text",
        bench.toSeq.toDF("gram"), n = 3).as[Long].collect().toSet
      assert(flagged == Set(1L, 2L))
    } finally query.stop()
  }

  test("streaming line dedup keeps first arrival per line across batches, parity with batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(
      StreamDedup.Doc(1, "SHARED HEADER\nunique one\n\nfooter A"),
      StreamDedup.Doc(2, "SHARED HEADER\nunique two\n\nfooter A"))
    val b2 = Seq(
      StreamDedup.Doc(3, "unique three\nfooter A\nSHARED HEADER"), // all dups but one
      StreamDedup.Doc(4, "SHARED HEADER\nunique one")) // every content line seen → vanishes
    val input = MemoryStream[StreamDedup.Doc]
    val qname = "stream_linededup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = StreamDedup.dedupLinesStream(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(qname).start()
    try {
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      val kept = spark.table(qname).as[StreamDedup.DocLine].collect()
      val byDoc = kept.groupBy(_.id).view
        .mapValues(_.sortBy(_.idx).map(_.line).mkString("\n")).toMap
      // header + footer survive only at their first (id, idx) arrival; the
      // whitespace-only line is structure and survives everywhere
      assert(byDoc(1L) == "SHARED HEADER\nunique one\n\nfooter A")
      assert(byDoc(2L) == "unique two\n")
      assert(byDoc(3L) == "unique three")
      assert(!byDoc.contains(4L), "a doc of only seen lines emits nothing")
      // parity: the BATCH operator over the same corpus (arrival order = id
      // order here) reassembles to the same per-doc texts
      val batch = graft.engine.Dedup.dedupLines(
        (b1 ++ b2).map(d => (d.id, d.text)).toDF("id", "text"), "id", "text")
        .select("id", "text").as[(Long, String)].collect().toMap
      assert(batch == byDoc.toMap)
    } finally query.stop()
  }

  test("dedupLinesStream ttl evicts idle line state; the next occurrence re-emits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDedup.Doc]
    val qname = "stream_linededup_ttl_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // ProcessingTimeTimeout makes `shouldRunAnotherBatch` true for every
    // trigger (no due-time check), so `noNewData` is NEVER signaled and
    // processAllAvailable would hang forever — the operator scaladoc
    // documents the trigger contract; the test polls the sink instead
    val query = StreamDedup.dedupLinesStream(input.toDS(),
      ttl = Some(java.time.Duration.ofSeconds(4)))
      .writeStream.outputMode("append").format("memory").queryName(qname)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
      .start()
    def emitted(): Seq[(Long, String)] = spark.table(qname)
      .as[StreamDedup.DocLine].collect().toSeq.map(l => (l.id, l.line))
    def waitFor(what: String)(cond: => Boolean): Unit = {
      val t0 = System.currentTimeMillis
      while (!cond) {
        query.exception.foreach(throw _)
        assert(System.currentTimeMillis - t0 < 60000, s"timed out waiting for $what")
        Thread.sleep(100)
      }
    }
    try {
      input.addData(StreamDedup.Doc(1, "REPEATED LINE\nalpha"))
      waitFor("doc 1 batch")(emitted().contains((1L, "alpha")))
      // same line again INSIDE the ttl window → suppressed (and refreshes)
      input.addData(StreamDedup.Doc(2, "REPEATED LINE\nbeta"))
      waitFor("doc 2 batch")(emitted().contains((2L, "beta")))
      assert(emitted().filter(_._2 == "REPEATED LINE").map(_._1) == Seq(1L),
        "in-window repeat must stay suppressed")
      Thread.sleep(9000) // > ttl with margin; no-data batches fire the eviction
      // after eviction the line is a FRESH first and emits again — the
      // documented divergence from the batch corpus-global rule
      input.addData(StreamDedup.Doc(4, "REPEATED LINE\ndelta"))
      waitFor("post-eviction re-emit")(
        emitted().filter(_._2 == "REPEATED LINE").map(_._1).sorted == Seq(1L, 4L))
    } finally query.stop()
  }
}
