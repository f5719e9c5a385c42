package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Real multimodal codecs: PNG decode through headless ImageIO with exact
  * integer statistics + grid-luma embedding, RIFF/PCM16 WAV parse, and the
  * decodeFeatures routing (real image/audio paths, stub only for video).
  */
class MultimodalCodecSpec extends AnyFunSuite {

  test("PNG round-trip: decoded statistics equal the pattern's closed form") {
    val (seed, w, h) = (7L, 16, 12)
    val png = Multimodal.ImageCodec.patternPng(seed, w, h)
    val f = Multimodal.ImageCodec.decode(png).get
    assert(f.width == w && f.height == h)
    var lumaSum = 0L
    var edgeSum = 0L
    val lumas = Array.ofDim[Int](h, w)
    for (y <- 0 until h; x <- 0 until w) {
      val r = ((x * 17 + y * 3 + seed) % 256).toInt
      val g = ((x * 5 + y * 29 + 2 * seed) % 256).toInt
      val b = ((x * 11 + y * 13 + 3 * seed) % 256).toInt
      lumas(y)(x) = (299 * r + 587 * g + 114 * b) / 1000
      lumaSum += lumas(y)(x)
      if (x > 0) edgeSum += math.abs(lumas(y)(x) - lumas(y)(x - 1))
    }
    assert(f.lumaSum == lumaSum)
    assert(f.edgeSum == edgeSum)
    // grid embedding: cell (0,0) = mean luma of the top-left 4x3 block / 255
    val cell0 = (for (y <- 0 until 3; x <- 0 until 4) yield lumas(y)(x)).sum / 12.0 / 255.0
    assert(math.abs(f.gridEmbedding(0) - cell0) < 1e-6)
    assert(f.gridEmbedding.length == 16)
  }

  test("image embedding is a locality-sensitive descriptor") {
    val a = Multimodal.ImageCodec.decode(Multimodal.ImageCodec.patternPng(1, 16, 12)).get
    // same generator seed at 2x the canvas: not a literal rescale (the
    // pattern uses absolute coordinates) but visually the same gradient
    val b = Multimodal.ImageCodec.decode(Multimodal.ImageCodec.patternPng(1, 32, 24)).get
    val c = Multimodal.ImageCodec.decode(Multimodal.ImageCodec.patternPng(200, 16, 12)).get
    def cos(x: Array[Float], y: Array[Float]): Double = Similarity.cosine(x, y)
    assert(cos(a.gridEmbedding, b.gridEmbedding) > 0.9, "similar image stays close")
    assert(cos(a.gridEmbedding, b.gridEmbedding) > cos(a.gridEmbedding, c.gridEmbedding))
  }

  test("WAV round-trip: decoded statistics equal the waveform's closed form") {
    val (seed, n) = (5L, 850)
    val wav = Multimodal.WavCodec.patternWav(seed, n)
    val f = Multimodal.WavCodec.decode(wav).get
    assert(f.sampleRate == 8000 && f.channels == 1 && f.nSamples == n)
    var absSum = 0L
    var crossings = 0
    var prevNeg = false
    for (k <- 0 until n) {
      val v = (((k * (17 + (seed % 13))) % 2048) - 1024).toInt
      absSum += math.abs(v)
      val neg = v < 0
      if (k > 0 && neg != prevNeg) crossings += 1
      prevNeg = neg
    }
    assert(f.absSum == absSum)
    assert(f.zeroCrossings == crossings)
  }

  test("non-media bytes are rejected, not misparsed") {
    assert(Multimodal.ImageCodec.decode(Array.tabulate(256)(_.toByte)).isEmpty)
    assert(Multimodal.WavCodec.decode(Array.tabulate(256)(_.toByte)).isEmpty)
  }

  test("image near-dup end-to-end: decode → grid embedding → embeddingNearDups") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // 40 distinct pattern images plus an exact re-encode of image 0: the
    // composed multimodal→dedup path must pair the copy with its original
    val rows = (0 until 40).map(i =>
      (i.toLong, Multimodal.ImageCodec.decode(
        Multimodal.ImageCodec.patternPng(i * 31L, 16, 12)).get.gridEmbedding)) :+
      (100L, Multimodal.ImageCodec.decode(
        Multimodal.ImageCodec.patternPng(0L, 16, 12)).get.gridEmbedding)
    val df = spark.createDataset(rows).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(df, "vec_id", "embedding", threshold = 0.9999)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100L)), s"exact image copy not paired: $pairs")
  }

  test("decodeFeatures routes real image payloads through ImageCodec") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val png = Multimodal.ImageCodec.patternPng(3, 16, 12)
    val rows = Seq(
      Multimodal.MediaRow(1, "image", png, 16, 12, 0),
      Multimodal.MediaRow(2, "audio", Multimodal.WavCodec.patternWav(3, 800), 0, 0, 100),
      Multimodal.MediaRow(3, "video", Array.tabulate(64)(_.toByte), 0, 0, 5000))
    val got = Multimodal.decodeFeatures(spark.createDataset(rows)).collect().sortBy(_.media_id)
    val expected = Multimodal.ImageCodec.decode(png).get.gridEmbedding
    assert(got(0).embedding.toSeq == expected.toSeq, "image row carries the REAL grid embedding")
    assert(got(0).frames_sampled == 1)
    assert(got(1).frames_sampled == 1, "800 samples @8kHz = 0.1s -> 1 analysis window")
    assert(got(2).frames_sampled == 5, "non-GIF video payload falls back to the stub plan (1 fps)")
  }

  test("GIF round-trip: sampled frame statistics equal the pattern's closed form") {
    val (seed, w, h, n) = (11L, 16, 12, 4)
    val gif = Multimodal.VideoCodec.patternGif(seed, w, h, n)
    val f = Multimodal.VideoCodec.decode(gif).get
    assert(f.nFrames == n && f.framesSampled == n)
    // gray pixels: luma(g) = g exactly, so frame sums have a closed form
    def frameSum(fr: Int): Long =
      (for (y <- 0 until h; x <- 0 until w)
        yield (x * 17 + y * 3 + seed + 7L * fr) % 256).sum
    val sums = (0 until n).map(frameSum)
    assert(f.lumaTotal == sums.sum)
    assert(f.lumaFirst == sums.head && f.lumaLast == sums.last)
    assert(f.temporalDiff == sums.sliding(2).map(p => math.abs(p(1) - p(0))).sum)
  }

  test("GIF frame sampling is even and capped at MaxSampledFrames") {
    val gif = Multimodal.VideoCodec.patternGif(3L, 8, 8, 15)
    val f = Multimodal.VideoCodec.decode(gif).get
    assert(f.nFrames == 15 && f.framesSampled == Multimodal.VideoCodec.MaxSampledFrames)
    // sampled indices j*(n-1)/(k-1) = j*2: frames 0,2,4,...,14
    def frameSum(fr: Int): Long =
      (for (y <- 0 until 8; x <- 0 until 8) yield (x * 17 + y * 3 + 3L + 7L * fr) % 256).sum
    val sampled = (0 until 8).map(j => frameSum(j * 2))
    assert(f.lumaTotal == sampled.sum)
    assert(f.lumaFirst == sampled.head && f.lumaLast == sampled.last)
  }

  test("decodeFeatures routes real GIF payloads through VideoCodec") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val gif = Multimodal.VideoCodec.patternGif(5L, 8, 8, 6)
    val rows = Seq(Multimodal.MediaRow(1, "video", gif, 8, 8, 6000))
    val got = Multimodal.decodeFeatures(spark.createDataset(rows)).collect()
    assert(got(0).frames_sampled == 6, "real GIF: all 6 frames sampled (under the cap)")
    // the embedding is the REAL mean-luma trajectory, zero-padded to 16
    val vf = Multimodal.VideoCodec.decode(gif).get
    assert(got(0).embedding.take(6).toSeq == vf.frameMeanLumas.toSeq)
    assert(got(0).embedding.drop(6).forall(_ == 0f))
  }

  test("frame mean lumas are the per-frame mean of the closed-form grays") {
    val vf = Multimodal.VideoCodec.decode(Multimodal.VideoCodec.patternGif(9L, 8, 8, 3)).get
    def mean(fr: Int): Float =
      ((for (y <- 0 until 8; x <- 0 until 8) yield (x * 17 + y * 3 + 9L + 7L * fr) % 256)
        .sum.toDouble / 64.0 / 255.0).toFloat
    assert(vf.frameMeanLumas.toSeq == (0 until 3).map(mean))
  }

  test("GIF rejects non-video bytes") {
    assert(Multimodal.VideoCodec.decode(Array.tabulate(256)(_.toByte)).isEmpty)
    // a PNG is readable by ImageIO but is not a GIF container
    assert(Multimodal.VideoCodec.decode(Multimodal.ImageCodec.patternPng(1, 8, 8)).isEmpty)
  }

  test("sniffable-but-corrupt payloads degrade to None, not a task-killing throw") {
    val gif = Multimodal.VideoCodec.patternGif(2L, 8, 8, 3)
    // keep the GIF header so the format sniff passes, corrupt the body
    for (cut <- Seq(16, 24, 40)) {
      val broken = gif.take(cut) ++ Array.fill(8)(0xFF.toByte)
      val r = try Multimodal.VideoCodec.decode(broken) catch {
        case e: Throwable => fail(s"decode threw ${e.getClass.getSimpleName} at cut=$cut")
      }
      assert(r.isEmpty || r.get.nFrames >= 1) // None, or a sane partial parse
    }
    // WAV with a lying (negative / truncated) chunk length must reject too
    val wav = Multimodal.WavCodec.patternWav(1L, 100)
    val lying = wav.clone()
    // fmt chunk length field at offset 16 → 0xFFFFFFFF (negative): without
    // the len < 0 guard the chunk walk would loop backwards forever
    lying(16) = 0xFF.toByte; lying(17) = 0xFF.toByte
    lying(18) = 0xFF.toByte; lying(19) = 0xFF.toByte
    assert(Multimodal.WavCodec.decode(lying).isEmpty)
    val truncatedFmt = wav.take(30) // fmt chunk cut short mid-header
    assert(Multimodal.WavCodec.decode(truncatedFmt).isEmpty)
  }

  test("WAV chunk length near Int.MaxValue must not wrap the walk (int overflow)") {
    // a positive-but-huge length once made `i + 8 + len + (len & 1)` wrap
    // negative, keeping the loop guard true and reading out of bounds
    val wav = Multimodal.WavCodec.patternWav(1L, 100)
    val huge = wav.clone()
    // data chunk length field at offset 40 → 0x7FFFFFF0 (positive, huge):
    // the walk must end at the truncated final chunk, and the data read
    // must clamp to the bytes actually present
    huge(40) = 0xF0.toByte; huge(41) = 0xFF.toByte
    huge(42) = 0xFF.toByte; huge(43) = 0x7F.toByte
    val r = try Multimodal.WavCodec.decode(huge) catch {
      case e: Throwable => fail(s"decode threw ${e.getClass.getSimpleName}")
    }
    assert(r.isDefined && r.get.nSamples == 100, "clamped parse of the real samples")
    // same wrap planted in a non-data chunk BEFORE data: parse stops there,
    // no data chunk seen → clean rejection, not a throw
    val early = wav.clone()
    early(16) = 0xF0.toByte; early(17) = 0xFF.toByte
    early(18) = 0xFF.toByte; early(19) = 0x7F.toByte
    val r2 = try Multimodal.WavCodec.decode(early) catch {
      case e: Throwable => fail(s"decode threw ${e.getClass.getSimpleName}")
    }
    assert(r2.isEmpty)
  }
}
