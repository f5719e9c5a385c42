package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Columnar CharGrid kernels: the non-monotone input path (long-key sort +
  * in-run x insertion sort) must group and order exactly like the ordered
  * fast path — the branch real OCR payloads with out-of-reading-order boxes
  * exercise.
  */
class GeometryGridSpec extends AnyFunSuite {

  // 3 lines across 2 pages; 'cd' pushed far right so line 1 has 2 word runs
  private def baseBoxes: Vector[Geometry.CharBox] =
    Geometry.syntheticCharBoxes("ab cd\nxyz\fqq").map(cb =>
      if (cb.offset >= 3 && cb.offset <= 4) cb.copy(x0 = cb.x0 + 100, x1 = cb.x1 + 100) else cb)

  test("non-monotone line layout takes the sort branch and still groups exactly") {
    // offsets stay ascending (the grid contract) but inside line 1 the x
    // order contradicts the offset order: 'ab' (offsets 0-1) sits RIGHT of
    // 'cd' (offsets 3-4) — pages/lines/x are no longer monotone
    val nonMono = baseBoxes.map(cb =>
      if (cb.page == 0 && cb.line == 1 && cb.offset <= 1)
        cb.copy(x0 = cb.x0 + 200, x1 = cb.x1 + 200)
      else cb)
    val g = Geometry.CharGrid.fromCharBoxes(nonMono)
    val lines = Geometry.lineBoxes(g)
    assert(lines.map(b => (b.page, b.line)) == Vector((0, 1), (0, 2), (1, 1)))
    // line-1 envelope spans from 'cd' (118) to the displaced 'ab' (212)
    assert(lines.head.x0 == 118.0 && lines.head.x1 == 212.0)
    // two word runs, reported in ascending x: 'cd' first, then 'ab'
    val runs = Geometry.mergedBoxes(g, 1.5).filter(b => b.page == 0 && b.line == 1)
    assert(runs.map(b => (b.x0, b.x1)) == Vector((118.0, 130.0), (200.0, 212.0)))
  }

  test("spanBox on the grid equals the boxed reference implementation") {
    val cs = baseBoxes
    val g = Geometry.CharGrid.fromCharBoxes(cs)
    for (start <- 0 to 10; end <- start + 1 to 12)
      assert(Geometry.spanBox(g, start, end) == Geometry.spanBox(cs, start, end),
        s"span [$start,$end)")
  }

  test("grid kernels equal the boxed-path semantics on a synthetic doc") {
    val text = "the quick brown\nfox jumps\fover it"
    val g = Geometry.syntheticGrid(text)
    val cs = Geometry.syntheticCharBoxes(text)
    assert(g.toCharBoxes == cs)
    assert(Geometry.lineBoxes(g) == Geometry.lineBoxes(cs))
    assert(Geometry.mergedBoxes(g, 1.5) == Geometry.mergedBoxes(cs, 1.5))
  }
}
