package graft.engine

import graft.core.Geometry
import org.scalatest.funsuite.AnyFunSuite

/** S3 bbox ingestion/validation (data.py:2097-2120, Bbox._valid 261-340). */
class IngestSpec extends AnyFunSuite {

  private val text = "ab cd\nef"
  private val chars = Geometry.syntheticCharBoxes(text)

  test("round-trip: grid payload validates and reproduces the char boxes") {
    val got = Ingest.validatedCharBoxes(text, Ingest.payloadOf(chars))
    assert(got == Right(chars))
  }

  test("char-identity violation is rejected with the reference vocabulary") {
    val p = Ingest.payloadOf(chars)
    val bad = p.copy(chars = "Xb cd" + p.chars.drop(5))
    val got = Ingest.validatedCharBoxes(text, bad)
    assert(got.isLeft && got.swap.exists(_.contains("Bbox provides character")))
  }

  test("space and newline box chars are exempt from identity (OCR noise)") {
    val p = Ingest.payloadOf(chars)
    val noisy = p.copy(chars = " " + p.chars.drop(1)) // box says ' ' where text says 'a'
    assert(Ingest.validatedCharBoxes(text, noisy).isRight)
  }

  test("negative width / out-of-page / negative coordinates are rejected") {
    val p = Ingest.payloadOf(chars)
    assert(Ingest.validatedCharBoxes(text, p.copy(x1 = p.x1.updated(0, p.x0(0) - 1)))
      .swap.exists(_.contains("negative width")))
    assert(Ingest.validatedCharBoxes(text, p.copy(y1 = p.y1.updated(0, 10000.0)))
      .swap.exists(_.contains("exceeds page height")))
    assert(Ingest.validatedCharBoxes(text, p.copy(x0 = p.x0.updated(0, -1.0), x1 = p.x1.updated(0, -0.5)))
      .swap.exists(_.contains("negative coordinate")))
  }

  test("zero width is tolerated by default, rejected in strict mode") {
    val p = Ingest.payloadOf(chars)
    val zw = p.copy(x1 = p.x1.updated(0, p.x0(0)))
    assert(Ingest.validatedCharBoxes(text, zw).isRight)
    assert(Ingest.validatedCharBoxes(text, zw, strict = true)
      .swap.exists(_.contains("no width")))
  }

  test("offsets outside the text and ragged payloads are rejected") {
    val p = Ingest.payloadOf(chars)
    assert(Ingest.validatedCharBoxes(text, p.copy(offsets = p.offsets.updated(0, 999))).isLeft)
    assert(Ingest.validatedCharBoxes(text, p.copy(offsets = p.offsets.drop(1))).isLeft)
  }
}
