package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed batch-wise in mapPartitions.
  *
  * The IMAGE path is REAL: [[ImageCodec]] decodes PNG/BMP/JPEG payloads
  * through the JDK's headless ImageIO, extracts exact integer pixel
  * statistics (luma sums, horizontal edge energy) and a 4×4 mean-luma grid
  * embedding via deterministic nearest-cell pooling — PNG is lossless, so
  * every feature is integer-exact and oracle-checkable (q51). AUDIO
  * payloads in RIFF/PCM16 WAV decode through [[WavCodec]] (pure RIFF
  * parse, no codec dependency). VIDEO payloads in multi-frame GIF decode
  * through [[VideoCodec]] (ImageIO sequence reader, even frame sampling,
  * temporal-difference energy — q54); [[StubCodec]] remains only as the
  * fallback for payloads none of the real codecs can read.
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

  /** REAL image decode via the JDK's headless ImageIO (PNG/BMP/JPEG — no
    * external libraries). All statistics are exact integer arithmetic over
    * the decoded raster, so a lossless payload (PNG/BMP) yields
    * oracle-checkable values on any JVM.
    */
  /** The shared pixel-luma kernel: (299r + 587g + 114b) / 1000 — integer
    * exact, and the identity luma(gray g) = g that the lossless image/video
    * oracles (q51/q54) rely on. One definition for both codecs.
    */
  @inline private def luma(rgb: Int): Int = {
    val r = (rgb >>> 16) & 0xff; val g = (rgb >>> 8) & 0xff; val b = rgb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  object ImageCodec {
    final case class ImageFeatures(
        width: Int, height: Int,
        lumaSum: Long, // Σ over pixels of (299r + 587g + 114b) / 1000
        edgeSum: Long, // Σ |luma(x+1,y) - luma(x,y)| — horizontal edge energy
        gridEmbedding: Array[Float]) // 4×4 mean-luma grid, row-major, /255

    /** Decode + feature-extract; None when ImageIO has no reader for the
      * payload (then callers fall back to [[StubCodec]]).
      */
    def decode(payload: Array[Byte]): Option[ImageFeatures] = {
      val img =
        // NonFatal, not just IOException: ImageIO readers throw
        // RuntimeExceptions on sniffable-but-corrupt payloads, and a
        // malformed crawl image must degrade to the stub, not kill the task
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      val lumas = new Array[Int](w * h)
      var lumaSum = 0L
      var edgeSum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val l = luma(img.getRGB(x, y))
          lumas(y * w + x) = l
          lumaSum += l
          if (x > 0) edgeSum += math.abs(l - lumas(y * w + x - 1))
          x += 1
        }
        y += 1
      }
      // 4×4 grid embedding: exact integer cell sums via floor bucketing
      // (cell of pixel x = x*4/w) — deterministic nearest-cell pooling,
      // no Graphics2D rendering in the path
      val cellSum = new Array[Long](16)
      val cellN = new Array[Long](16)
      y = 0
      while (y < h) {
        val cy = y * 4 / h
        var x = 0
        while (x < w) {
          val c = cy * 4 + x * 4 / w
          cellSum(c) += lumas(y * w + x)
          cellN(c) += 1
          x += 1
        }
        y += 1
      }
      val emb = Array.tabulate(16)(c =>
        if (cellN(c) == 0) 0f else (cellSum(c).toDouble / cellN(c) / 255.0).toFloat)
      Some(ImageFeatures(w, h, lumaSum, edgeSum, emb))
    }

    /** Encode a deterministic pattern image as PNG (lossless round-trip). */
    def patternPng(seed: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((x * 17 + y * 3 + seed) % 256).toInt
          val g = ((x * 5 + y * 29 + 2 * seed) % 256).toInt
          val b = ((x * 11 + y * 13 + 3 * seed) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** REAL RIFF/PCM16 WAV decode — a pure byte parse, no codec dependency.
    * Exact integer statistics (sample count, abs-sum, zero crossings) over
    * the first channel.
    */
  object WavCodec {
    final case class WavFeatures(
        sampleRate: Int, channels: Int, nSamples: Int,
        absSum: Long, zeroCrossings: Int)

    private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

    def decode(payload: Array[Byte]): Option[WavFeatures] = {
      if (payload.length < 44) return None
      if (!(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F')) return None
      if (!(payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E')) return None
      var i = 12
      var fmtChannels = 0; var fmtRate = 0; var fmtBits = 0
      var dataOff = -1; var dataLen = 0
      var more = true
      while (more && i + 8 <= payload.length) {
        val id = new String(payload, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val len = le32(payload, i + 4)
        // a lying header (negative chunk length) must reject the payload,
        // not loop forever or read out of bounds
        if (len < 0) return None
        if (id == "fmt ") {
          if (i + 24 > payload.length) return None
          fmtChannels = le16(payload, i + 10)
          fmtRate = le32(payload, i + 12)
          fmtBits = le16(payload, i + 22)
        } else if (id == "data") { dataOff = i + 8; dataLen = len }
        // advance in Long: a corrupt length near Int.MaxValue would wrap
        // `i + 8 + len` negative, keep the guard true, and read out of
        // bounds. A chunk running past the payload (truncated final chunk —
        // common in crawls) ends the walk but keeps what was parsed: the
        // data read below already clamps to the bytes actually present.
        val next = i.toLong + 8L + len.toLong + (len & 1)
        if (next > payload.length.toLong) more = false else i = next.toInt
      }
      if (dataOff < 0 || fmtBits != 16 || fmtChannels < 1) return None
      val frameBytes = 2 * fmtChannels
      val n = math.min(dataLen, payload.length - dataOff) / frameBytes
      var absSum = 0L
      var crossings = 0
      var prevNeg = false
      var k = 0
      while (k < n) {
        val s = le16(payload, dataOff + k * frameBytes).toShort.toInt
        absSum += math.abs(s)
        val neg = s < 0
        if (k > 0 && neg != prevNeg) crossings += 1
        prevNeg = neg
        k += 1
      }
      Some(WavFeatures(fmtRate, fmtChannels, n, absSum, crossings))
    }

    /** Encode a deterministic mono PCM16 WAV (triangle-ish wave). */
    def patternWav(seed: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
      val dataLen = nSamples * 2
      val out = new Array[Byte](44 + dataLen)
      def put(i: Int, s: String): Unit = { var k = 0; while (k < s.length) { out(i + k) = s.charAt(k).toByte; k += 1 } }
      def p32(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte; out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte }
      def p16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
      put(0, "RIFF"); p32(4, 36 + dataLen); put(8, "WAVE")
      put(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, 1); p32(24, sampleRate)
      p32(28, sampleRate * 2); p16(32, 2); p16(34, 16)
      put(36, "data"); p32(40, dataLen)
      var k = 0
      while (k < nSamples) {
        val v = (((k * (17 + (seed % 13))) % 2048) - 1024).toInt
        p16(44 + k * 2, v & 0xffff)
        k += 1
      }
      out
    }
  }

  /** REAL video-container decode: multi-frame GIF through the JDK's
    * ImageIO reader. GIF is the one multi-frame format the JVM can both
    * write and read without external codecs; with a 256-level gray indexed
    * palette the round-trip is lossless and luma(gray g) = g exactly
    * ((299+587+114)·g/1000), so every frame statistic is integer-exact and
    * oracle-checkable (q54). Frames are sampled evenly up to
    * [[VideoCodec.MaxSampledFrames]] — the frame-sample path of a
    * video pipeline, with temporal-difference energy across the samples.
    */
  object VideoCodec {
    final case class VideoFeatures(
        nFrames: Int, framesSampled: Int,
        lumaTotal: Long, // Σ over sampled frames of the frame's luma sum
        lumaFirst: Long, lumaLast: Long, // first/last SAMPLED frame
        temporalDiff: Long, // Σ |frameSum(j+1) - frameSum(j)| over samples
        frameMeanLumas: Array[Float]) // per-sampled-frame mean luma / 255

    val MaxSampledFrames = 8

    /** Decode + frame-sample; None when the payload is not a readable GIF
      * (then callers fall back to [[StubCodec]]). Catches all non-fatal
      * decode failures, not just IOException: the JDK GIF reader throws
      * RuntimeExceptions (index/negative-size errors) on payloads that pass
      * the format sniff but carry corrupt LZW/descriptor data, and a
      * malformed crawl payload must degrade to the stub, not kill the task.
      */
    def decode(payload: Array[Byte]): Option[VideoFeatures] = {
      val iis =
        try javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => return None }
      if (iis == null) return None
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          if (!"gif".equalsIgnoreCase(reader.getFormatName)) return None
          val n = reader.getNumImages(true)
          if (n <= 0) return None
          val k = math.min(n, MaxSampledFrames)
          var first = -1L; var prev = -1L; var last = 0L
          var total = 0L; var tdiff = 0L
          val means = new Array[Float](k)
          var j = 0
          while (j < k) {
            // even temporal sampling over [0, n-1]
            val fi = if (k == 1) 0 else j * (n - 1) / (k - 1)
            val img = reader.read(fi)
            val w = img.getWidth; val h = img.getHeight
            var s = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { s += luma(img.getRGB(x, y)); x += 1 }
              y += 1
            }
            if (first < 0) first = s
            if (prev >= 0) tdiff += math.abs(s - prev)
            prev = s; last = s; total += s
            if (w > 0 && h > 0) means(j) = (s.toDouble / (w.toLong * h) / 255.0).toFloat
            j += 1
          }
          Some(VideoFeatures(n, k, total, first, last, tdiff, means))
        } catch { case scala.util.control.NonFatal(_) => None }
        finally reader.dispose()
      } finally iis.close()
    }

    /** Encode a deterministic gray-pattern animated GIF (lossless indexed
      * round-trip): frame f pixel (x,y) has gray (x*17 + y*3 + seed + 7f)
      * mod 256.
      */
    def patternGif(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
      val gray = Array.tabulate(256)(_.toByte)
      val cm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, ((x * 17 + y * 3 + seed + 7L * f) % 256).toInt)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
      } finally {
        writer.dispose()
        ios.close()
      }
      bos.toByteArray
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
      it.map { row =>
        row.media_type match {
          case "image" =>
            ImageCodec.decode(row.payload) match {
              case Some(f) => // REAL decode: grid-luma embedding, 1 frame
                StubCodec.decode(row).copy(embedding = f.gridEmbedding, frames_sampled = 1)
              case None => StubCodec.decode(row) // not a decodable image payload
            }
          case "audio" =>
            WavCodec.decode(row.payload) match {
              case Some(wf) => // REAL PCM16 parse: 10 analysis windows/sec
                StubCodec.decode(row).copy(
                  frames_sampled = math.max(1, wf.nSamples / math.max(1, wf.sampleRate / 10)))
              case None => StubCodec.decode(row)
            }
          case _ =>
            VideoCodec.decode(row.payload) match {
              case Some(vf) => // REAL GIF frame-sample: the embedding is the
                // per-sampled-frame mean-luma trajectory, zero-padded
                val emb = new Array[Float](StubCodec.EmbeddingDim)
                System.arraycopy(vf.frameMeanLumas, 0, emb, 0,
                  math.min(vf.frameMeanLumas.length, emb.length))
                StubCodec.decode(row).copy(
                  embedding = emb, frames_sampled = vf.framesSampled)
              case None => StubCodec.decode(row) // not a readable GIF payload
            }
        }
      }
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
