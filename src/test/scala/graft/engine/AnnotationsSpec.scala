package graft.engine

import graft.core.Span
import org.scalatest.funsuite.AnyFunSuite

/** F3: the annotation duplicate contract (the 8 overlap-permutation cases of
  * tests/test_data.py:276-431) and view_annotations (data.py:1847-1882).
  */
class AnnotationsSpec extends AnyFunSuite {
  import Annotations._

  private def ann(id: Long, label: String, correct: Boolean, spans: (Int, Int)*) =
    Ann(id, label, spans.map { case (s, e) => Span(s, e) }.toVector, correct, revised = false, None)

  // --- the 8 overlap permutations (duplicate = same label + identical span set) ---

  test("identical spans, same label, both correct -> duplicate rejected") {
    assert(addAll(Seq(ann(1, "one", true, (1, 2)), ann(2, "one", true, (1, 2)))).isLeft)
  }
  test("partially overlapping spans, same label, both correct -> accepted") {
    assert(addAll(Seq(ann(1, "one", true, (1, 2)), ann(2, "one", true, (1, 2), (2, 3)))).isRight)
  }
  test("identical spans, same label, both incorrect -> duplicate rejected") {
    assert(addAll(Seq(ann(1, "one", false, (1, 2)), ann(2, "one", false, (1, 2)))).isLeft)
  }
  test("partially overlapping spans, same label, both incorrect -> accepted") {
    assert(addAll(Seq(ann(1, "one", false, (1, 2)), ann(2, "one", false, (1, 2), (2, 3)))).isRight)
  }
  test("identical spans, same label, mixed correctness -> duplicate rejected") {
    assert(addAll(Seq(ann(1, "one", true, (1, 2)), ann(2, "one", false, (1, 2)))).isLeft)
  }
  test("partially overlapping spans, same label, mixed correctness -> accepted") {
    assert(addAll(Seq(ann(1, "one", true, (1, 2)), ann(2, "one", false, (1, 2), (2, 3)))).isRight)
  }
  test("identical spans, different labels, both correct -> accepted") {
    assert(addAll(Seq(ann(1, "two", true, (1, 2)), ann(2, "one", true, (1, 2)))).isRight)
  }
  test("identical spans, different labels, both incorrect -> accepted") {
    assert(addAll(Seq(ann(1, "one", false, (1, 2)), ann(2, "two", false, (1, 2)))).isRight)
  }
  test("partially overlapping spans, different labels, mixed -> accepted") {
    assert(addAll(Seq(ann(1, "one", true, (1, 2)), ann(2, "two", false, (1, 2), (2, 3)))).isRight)
  }

  // --- view_annotations ---

  private val thr = Map("a" -> 0.5, "b" -> 0.5).withDefaultValue(0.1)
  private def view(anns: Seq[Ann], noMulti: Set[String] = Set.empty) =
    viewAnnotations(anns, thr, l => !noMulti.contains(l))

  test("greedy suppression: higher confidence wins the overlap") {
    val lo = Ann(1, "a", Vector(Span(0, 10)), false, false, Some(0.7))
    val hi = Ann(2, "a", Vector(Span(5, 15)), false, false, Some(0.9))
    assert(view(Seq(lo, hi)).map(_.annId) == Vector(2))
  }

  test("is_correct outranks any confidence") {
    val correct = Ann(1, "a", Vector(Span(0, 10)), true, false, Some(0.51))
    val confident = Ann(2, "a", Vector(Span(5, 15)), false, false, Some(0.99))
    assert(view(Seq(confident, correct)).map(_.annId) == Vector(1))
  }

  test("below-threshold candidates are dropped; conf None/0 passes (Python truthiness)") {
    val below = Ann(1, "a", Vector(Span(0, 5)), false, false, Some(0.4))
    val noConf = Ann(2, "a", Vector(Span(10, 15)), true, false, None)
    val zeroConf = Ann(3, "a", Vector(Span(20, 25)), true, false, Some(0.0))
    assert(view(Seq(below, noConf, zeroConf)).map(_.annId) == Vector(2, 3))
  }

  test("user-rejected (revised && !is_correct) candidates are dropped") {
    val rejected = Ann(1, "a", Vector(Span(0, 5)), false, true, Some(0.99))
    val ok = Ann(2, "a", Vector(Span(0, 5)), false, false, Some(0.8))
    assert(view(Seq(rejected, ok)).map(_.annId) == Vector(2))
  }

  test("multi-span annotations fill all their spans") {
    val multi = Ann(1, "a", Vector(Span(0, 5), Span(20, 25)), false, false, Some(0.9))
    val mid = Ann(2, "a", Vector(Span(10, 15)), false, false, Some(0.8))
    val clash = Ann(3, "a", Vector(Span(22, 30)), false, false, Some(0.7))
    assert(view(Seq(multi, mid, clash)).map(_.annId) == Vector(1, 2))
  }

  test("single-top-candidate labels keep only the best annotation") {
    val first = Ann(1, "a", Vector(Span(0, 5)), false, false, Some(0.9))
    val second = Ann(2, "a", Vector(Span(10, 15)), false, false, Some(0.8))
    val other = Ann(3, "b", Vector(Span(20, 25)), false, false, Some(0.7))
    assert(view(Seq(first, second, other), noMulti = Set("a")).map(_.annId) == Vector(1, 3))
  }

  test("result is sorted by span start") {
    val a = Ann(1, "a", Vector(Span(20, 25)), false, false, Some(0.9))
    val b = Ann(2, "a", Vector(Span(0, 5)), false, false, Some(0.8))
    assert(view(Seq(a, b)).map(_.annId) == Vector(2, 1))
  }
}
