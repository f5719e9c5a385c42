package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed batch-wise in mapPartitions.
  *
  * The Spark-side contract (schema, partition discipline, batch shape,
  * deterministic outputs) is real and tested; the actual media DECODE step
  * is STUBBED — image/audio codecs are not in this container — behind
  * [[StubCodec]], which produces deterministic fake features from the bytes.
  * Swapping in a real codec touches only that object.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      media_type: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Int,
  )

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Int,
      sha256: String,
      // decoded-feature stub: fixed-width embedding + per-frame sample count
      embedding: Array[Float],
      frames_sampled: Int,
  )

  /** STUB: deterministic fake decode. A real implementation would decode the
    * payload (JPEG/WAV/MP4) and run feature extraction; this derives a
    * repeatable pseudo-embedding from the payload bytes so the distributed
    * plumbing (batching, schema, determinism) is exercised honestly.
    */
  object StubCodec {
    val EmbeddingDim = 16
    // getInstance has JCA lock contention — one digest per executor thread
    private val sha256Local = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("SHA-256")
    }
    def decode(row: MediaRow): MediaFeatures = {
      val md = sha256Local.get()
      md.reset()
      val digest = md.digest(row.payload)
      val emb = new Array[Float](EmbeddingDim)
      var i = 0
      while (i < EmbeddingDim) {
        val b0 = digest(i * 2 % digest.length) & 0xff
        val b1 = digest((i * 2 + 1) % digest.length) & 0xff
        emb(i) = ((b0 << 8 | b1) - 32768) / 32768.0f
        i += 1
      }
      val frames = row.media_type match {
        case "video" => math.max(1, row.duration_ms / 1000) // 1 fps sampling plan
        case "audio" => math.max(1, row.duration_ms / 100) // 10 windows/sec
        case _ => 1
      }
      MediaFeatures(row.media_id, row.media_type, row.payload.length,
        digest.map("%02x".format(_)).mkString, emb, frames)
    }
  }

  /** Batch decode: mapPartitions so a real codec could amortize per-batch
    * model/codec initialization (the Pandas-UDF batching pattern, JVM-side).
    */
  def decodeFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.mapPartitions { it =>
      // per-partition codec init would happen here (once per batch)
      it.map(StubCodec.decode)
    }
  }

  /** Deterministic synthetic media corpus for tests/benches. */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { i =>
      val kind = (i % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val len = 64 + (i % 512).toInt
      val payload = Array.tabulate(len)(j => ((i * 131 + j * 31) & 0xff).toByte)
      MediaRow(i, kind, payload, if (kind == "image") 640 else 0,
        if (kind == "image") 480 else 0, if (kind == "image") 0 else 1000 + (i % 9000).toInt)
    }
  }
}
