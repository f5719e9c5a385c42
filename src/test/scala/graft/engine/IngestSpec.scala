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

  test("unsorted payloads are accepted and sorted (dict semantics, data.py:2100-2117)") {
    // the reference keys boxes by character index in a dict — serialization
    // order is not a contract. Reverse the payload: same grid must result.
    val p = Ingest.payloadOf(chars)
    val rev = Ingest.CharBoxPayload(
      p.offsets.reverse, p.chars.reverse, p.pageNumbers.reverse, p.lineNumbers.reverse,
      p.x0.reverse, p.x1.reverse, p.y0.reverse, p.y1.reverse)
    assert(Ingest.validatedCharBoxes(text, rev) == Right(chars))
  }

  test("duplicate offsets resolve last-write-wins (dict semantics)") {
    val p = Ingest.payloadOf(chars)
    // append a second box for offset 0 with a different x — the appended
    // (later) entry must win, like dict insertion order in the reference
    val dup = Ingest.CharBoxPayload(
      p.offsets :+ p.offsets(0), p.chars + p.chars.charAt(0),
      p.pageNumbers :+ p.pageNumbers(0), p.lineNumbers :+ p.lineNumbers(0),
      p.x0 :+ 100.0, p.x1 :+ 106.0, p.y0 :+ p.y0(0), p.y1 :+ p.y1(0))
    val got = Ingest.validatedGrid(text, dup).toOption.get
    assert(got.length == chars.length, "duplicate collapsed")
    assert(got.x0(0) == 100.0 && got.x1(0) == 106.0, "later entry wins")
  }

  test("negative line numbers are rejected at ingestion") {
    val p = Ingest.payloadOf(chars)
    assert(Ingest.validatedCharBoxes(text, p.copy(lineNumbers = p.lineNumbers.updated(0, -1))).isLeft)
  }
}
