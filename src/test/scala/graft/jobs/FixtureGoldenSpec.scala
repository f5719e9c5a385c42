package graft.jobs

import graft.core.Span
import graft.engine.SparkTestBase
import graft.sources.FixtureProject
import graft.tools.FixtureGoldenCli
import org.scalatest.funsuite.AnyFunSuite

/** E9 composed golden: train the scorer on the reference's 5 frozen fixture
  * payslips and extract TEST_DOCUMENT_ID (44823) through the full pipeline
  * (tests/trainer/test_information_extraction.py:78-186). The engine's
  * tuple set is PINNED here (and in the q49 oracle); span-strict P/R/F1
  * against the fixture ground truth and the overlap with the reference's
  * 20 golden tuples (entity_results_data) are asserted as hard floors.
  */
class FixtureGoldenSpec extends AnyFunSuite {

  private val root = FixtureGoldenJob.DefaultRoot
  private def available = FixtureGoldenJob.available(root)

  /** The frozen engine tuple set for doc 44823 — byte-identical at every
    * parallelism level (verified at local[8] and local[32]).
    */
  private val pinned = Vector(
    ("Austellungsdatum", 159, 169, "22.05.2018"),
    ("Personalausweis", 352, 357, "00104"),
    ("Steuerklasse", 365, 366, "1"),
    ("Personalausweis", 1194, 1199, "00104"),
    ("Gesamt-Brutto", 1498, 1504, "198,34"),
    ("Vorname", 1507, 1518, "Erna-Muster"),
    ("Nachname", 1519, 1527, "Eiermann"),
    ("Gesamt-Brutto", 1582, 1587, "10,89"),
    ("Lohnart", 1758, 1762, "2000"),
    ("Bezeichnung", 1763, 1769, "Gehalt"),
    ("Betrag", 1831, 1839, "3.120,00"),
    ("Gesamt-Brutto", 2111, 2119, "3.120,00"),
    ("Sozialversicherung", 2255, 2262, "3.12000"),
    ("Sozialversicherung", 2269, 2274, "25732"),
    ("Sozialversicherung", 2281, 2285, "2062"),
    ("Sozialversicherung", 2292, 2296, "1417"),
    ("Steuerrechtliche Abzüge", 2324, 2330, "292,11"),
    ("Sozialversicherung", 2685, 2692, "3.12000"),
    ("Steuerrechtliche Abzüge", 2734, 2740, "638,82"),
    ("Netto-Verdienst", 3004, 3012, "2.189,07"),
    ("Steuer-Brutto", 3141, 3149, "42.42950"),
    ("Auszahlungsbetrag", 3777, 3785, "2.189,07"))

  private lazy val got =
    FixtureGoldenJob.trainAndExtract(SparkTestBase.spark, root)

  test("composed train→extract reproduces the pinned tuple set exactly") {
    assume(available)
    val gotTuples = got.map(t => (t.label, t.start, t.end, t.offset_string))
    assert(gotTuples == pinned)
  }

  test("every extracted tuple clears its label's threshold") {
    assume(available)
    val thresholds = FixtureProject.labels(root).map(l => l.name -> l.threshold).toMap
    got.foreach(t => assert(t.confidence >= thresholds(t.label), t))
  }

  test("span-strict P/R/F1 vs the fixture ground truth") {
    assume(available)
    val truth = FixtureProject.loadDoc(root, FixtureGoldenJob.ExtractId)
      .spans.filter(_.isCorrect).map(s => (s.label, s.start, s.end)).toSet
    val gotSet = got.map(t => (t.label, t.start, t.end)).toSet
    val tp = gotSet.intersect(truth).size
    val p = tp.toDouble / gotSet.size
    val r = tp.toDouble / truth.size
    val f1 = 2 * p * r / (p + r)
    assert(tp == 20, s"strict TP $tp")
    // the reference's own frozen contract on this doc is f1 = 0.8108
    // (test_information_extraction.py:169); the engine's deterministic
    // softmax scores 0.9302 — keep a hard floor above the reference
    assert(f1 >= 0.90, s"strict F1 $f1")
  }

  test("all 20 of the reference's entity_results_data tuples are recovered") {
    assume(available)
    val gotSet = got.map(t => (t.label, t.start, t.end)).toSet
    val overlap = gotSet.intersect(FixtureGoldenCli.referenceTuples).size
    assert(overlap == 20, s"overlap $overlap/20")
  }

  test("containment labeling replicates the reference's inclusive pointer walk") {
    val spans = Vector(
      FixtureProject.FixtureSpan(1, "A", 10, 15, isCorrect = true, revised = false),
      FixtureProject.FixtureSpan(2, "B", 20, 30, isCorrect = true, revised = false))
    val tokens = IndexedSeq(
      Span(0, 5),   // before everything -> NO_LABEL
      Span(10, 15), // exact match -> A
      Span(12, 15), // inside (end == span end, inclusive) -> A
      Span(14, 16), // crosses the end -> NO_LABEL
      Span(22, 25), // inside B -> B
      Span(31, 33)) // after -> NO_LABEL
    val got = FixtureGoldenJob.containmentLabels(tokens, spans)
    assert(got.toSeq == Seq("NO_LABEL", "A", "A", "NO_LABEL", "B", "NO_LABEL"))
  }
}
