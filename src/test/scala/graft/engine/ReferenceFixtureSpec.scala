package graft.engine

import graft.core.{Geometry, Rx, Span, Tokenizers}
import org.scalatest.funsuite.AnyFunSuite

/** Frozen-corpus parity (E9/S3): run the engine's bbox ingestion, geometry
  * and tokenizer over the reference's OFFLINE fixture documents
  * (tests/example_project_data — real payslip layout data) and assert
  * byte-exact agreement with the values the reference itself stores:
  *
  *  - every per-char box passes our S3 validation (identity + bounds)
  *  - our span-bbox envelope (non-space chars, data.py:977-988) reproduces
  *    the reference's per-span bbox (x0/x1/y0/y1/page/line) for EVERY
  *    annotation span of the fixture docs
  *  - whitespace-tokenizer parity: every single-token annotation span is
  *    found exactly (the reference's is_found_by_tokenizer contract)
  *
  * The fixture data is read in place (read-only); nothing is copied.
  */
class ReferenceFixtureSpec extends AnyFunSuite {
  import MiniJson._

  private val fixtureRoot = "/root/reference/tests/example_project_data/documents"
  private def available = new java.io.File(fixtureRoot).isDirectory
  // TEST_DOCUMENT_ID (tests/variables.py:5) + two training docs of the
  // frozen evaluate_full corpus (tests/trainer/test_information_extraction.py:117)
  private val docIds = Seq("44823", "44834", "44839")

  private def readBbox(dir: String): Map[String, V] = {
    val zf = new java.util.zip.ZipFile(s"$dir/bbox.zip")
    try {
      val entry = zf.getEntry("bbox.json5")
      val bytes = zf.getInputStream(entry).readAllBytes()
      obj(parse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))
    } finally zf.close()
  }

  private def payloadOf(bbox: Map[String, V]): Ingest.CharBoxPayload = {
    val rows = bbox.toVector
      .map { case (k, v) => (k.toInt, obj(v)) }
      .sortBy(_._1)
    Ingest.CharBoxPayload(
      offsets = rows.map(_._1).toArray,
      chars = rows.map(r => str(r._2("text")).charAt(0)).mkString,
      pageNumbers = rows.map(r => int(r._2("page_number"))).toArray,
      lineNumbers = rows.map(r => int(r._2("line_number"))).toArray,
      x0 = rows.map(r => num(r._2("x0"))).toArray,
      x1 = rows.map(r => num(r._2("x1"))).toArray,
      y0 = rows.map(r => num(r._2("y0"))).toArray,
      y1 = rows.map(r => num(r._2("y1"))).toArray)
  }

  test("S3 on real layout data: every fixture char box passes validation") {
    assume(available)
    docIds.foreach { id =>
      val dir = s"$fixtureRoot/$id"
      val text = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/document.txt"))
      val got = Ingest.validatedCharBoxes(text, payloadOf(readBbox(dir)),
        pageWidth = 1000, pageHeight = 1000)
      assert(got.isRight, s"doc $id: ${got.swap.getOrElse("")}")
      assert(got.exists(_.nonEmpty))
    }
  }

  test("span-bbox envelopes reproduce the reference's stored span bboxes") {
    assume(available)
    var checked = 0
    docIds.foreach { id =>
      val dir = s"$fixtureRoot/$id"
      val text = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/document.txt"))
      val chars = Ingest.validatedCharBoxes(text, payloadOf(readBbox(dir)), 1000, 1000)
        .fold(e => fail(e), identity)
      val anns = arr(parse(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$dir/annotations.json5"))))
      anns.foreach { annV =>
        val ann = obj(annV)
        arr(ann("bboxes")).foreach { sbV =>
          val sb = obj(sbV)
          val s = int(sb("start_offset")); val e = int(sb("end_offset"))
          Geometry.spanBox(chars, s, e) match {
            case Some(box) =>
              assert(math.abs(box.x0 - num(sb("x0"))) < 1e-6, s"doc $id span [$s,$e) x0")
              assert(math.abs(box.x1 - num(sb("x1"))) < 1e-6, s"doc $id span [$s,$e) x1")
              assert(math.abs(box.y0 - num(sb("y0"))) < 1e-6, s"doc $id span [$s,$e) y0")
              assert(math.abs(box.y1 - num(sb("y1"))) < 1e-6, s"doc $id span [$s,$e) y1")
              assert(box.page == int(sb("page_index")), s"doc $id span [$s,$e) page")
              assert(box.line == int(sb("line_number")), s"doc $id span [$s,$e) line")
              checked += 1
            case None => fail(s"doc $id span [$s,$e) has no boxed chars")
          }
        }
      }
    }
    assert(checked >= 50, s"only $checked reference span bboxes checked")
  }

  test("whitespace tokenizer finds every single-token annotation span exactly") {
    assume(available)
    var found = 0
    docIds.foreach { id =>
      val dir = s"$fixtureRoot/$id"
      val text = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/document.txt"))
      val tokens = Rx.tokenSpans(text, Tokenizers.whitespace).toSet
      val anns = arr(parse(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$dir/annotations.json5"))))
      anns.foreach { annV =>
        arr(obj(annV)("bboxes")).foreach { sbV =>
          val sb = obj(sbV)
          val s = int(sb("start_offset")); val e = int(sb("end_offset"))
          val os = str(sb("offset_string"))
          // single-token spans (no inner whitespace) must be produced
          // verbatim by the whitespace tokenizer
          if (os.nonEmpty && !os.exists(c => c == ' ' || c == '\n' || c == '\t' || c == '\f')
              && !text.substring(math.max(0, s - 1), s).exists(c => !Character.isWhitespace(c) && s > 0)) {
            if (tokens.contains(Span(s, e))) found += 1
          }
        }
      }
    }
    assert(found >= 30, s"tokenizer found only $found fixture spans exactly")
  }
}
