package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Gopher-style repetition masses: hand-computed closed forms. */
class QualityRepetitionSpec extends AnyFunSuite {

  test("no repetition: dup mass 0, top = the max single-gram mass") {
    // 2-grams of "a bb ccc": "a bb"(4), "bb ccc"(6) — all unique
    val r = Quality.repetition("a bb ccc", 2)
    assert(r == Quality.Repetition(0L, 6L, 10L))
  }

  test("full repetition: every gram duplicated") {
    // "x y x y x y": 2-grams = x y, y x, x y, y x, x y → "x y"×3 + "y x"×2
    val r = Quality.repetition("x y x y x y", 2)
    assert(r == Quality.Repetition(3L * 3 + 2L * 3, 9L, 15L))
  }

  test("n larger than token count yields zeros; empty text too") {
    assert(Quality.repetition("one two", 3) == Quality.Repetition(0L, 0L, 0L))
    assert(Quality.repetition("", 2) == Quality.Repetition(0L, 0L, 0L))
  }

  test("trailing-empty token semantics match string_split (split limit -1)") {
    // "a b " → tokens [a, b, ""] → 2-grams "a b"(3) and "b "(2: 'b'+' '+'')
    val r = Quality.repetition("a b ", 2)
    assert(r == Quality.Repetition(0L, 3L, 5L))
  }

  test("3-gram masses on a planted phrase") {
    // "w1 w2 w1 w2 w1 w2" 3-grams: "w1 w2 w1"×2, "w2 w1 w2"×2 (len 8 each)
    val r = Quality.repetition("w1 w2 w1 w2 w1 w2", 3)
    assert(r == Quality.Repetition(4L * 8, 2L * 8, 4L * 8))
  }
}
