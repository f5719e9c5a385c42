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
}
