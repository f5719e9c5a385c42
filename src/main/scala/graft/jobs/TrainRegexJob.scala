package graft.jobs

import graft.core.{RegexGen, Span}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed regex induction (R5-R9, SURVEY §3.2): learn tokenizer regexes
  * for a label from annotated examples.
  *
  * Plan shape: annotations → 3 token proposals each (narrow flatMap) →
  * dedupe by group-name-stripped matcher (one shuffle on the matcher
  * string) → broadcast the candidate bank (it is small after dedup; never a
  * join side) → evaluate every candidate on every document in one
  * mapPartitions pass (the reference's "nested evaluation query",
  * data.py:2257-2313) → per-regex aggregation (one shuffle) → driver-side
  * greedy set cover (regex.py:104-150) over the tiny stats table.
  */
object TrainRegexJob {

  final case class Annotation(docId: Long, labelId: Long, annId: Long, start: Int, end: Int)

  final case class Candidate(regex: String, quality: Int)

  final case class TrainResult(
      bestRegex: Vector[String],
      stats: Vector[RegexGen.RegexStats],
      nCandidates: Int,
  )

  def run(
      spark: SparkSession,
      docs: Dataset[(Long, String)],
      annotations: Dataset[Annotation],
      labelId: Long,
  ): TrainResult = {
    import spark.implicits._

    // R5: three proposals per annotated span (needs the span's offset string)
    val docsByIdDF = docs.toDF("docId", "text")
    val anns = annotations.filter(_.labelId == labelId).toDF()
    val proposals = anns.join(docsByIdDF, "docId")
      .as[(Long, Long, Long, Int, Int, String)]
      .flatMap { case (docId, _, annId, start, end, text) =>
        if (end <= text.length && start >= 0 && start < end)
          RegexGen.annotationTokens(text.substring(start, end), labelId, annId, start)
            .map(t => Candidate(t.regex, t.quality))
        else Nil
      }

    // R6: dedupe on the stripped matcher — first (lowest quality number)
    // wins, mirroring token_append's first-wins over the W(0)/N(1)/F(2)
    // append order (data.py:1450-1462, 1473-1481). Note the reference then
    // SORTS selection by regex_quality DESCENDING (regex.py:112-121) — the
    // apparent inconsistency is the reference's own and is replicated
    // exactly in bestRegex.
    val deduped = proposals
      .map(c => (RegexGen.normalizedMatcher(c.regex), c))
      .groupByKey(_._1)
      .reduceGroups { (a, b) =>
        val cmp = Ordering.Tuple2[Int, String].compare(
          (a._2.quality, a._2.regex), (b._2.quality, b._2.regex))
        if (cmp <= 0) a else b
      }
      .map(_._2._2)
      .collect()
    require(deduped.length < 100000, s"candidate bank too large: ${deduped.length}")

    // R7: evaluate the broadcast bank against every document
    val bank = spark.sparkContext.broadcast(deduped)
    val gtByDoc = anns.as[Annotation]
      .map(a => (a.docId, (a.annId, a.start, a.end)))
      .groupByKey(_._1).mapGroups((d, it) => (d, it.map(_._2).toArray))
      .collect().toMap
    val gtBc = spark.sparkContext.broadcast(gtByDoc)
    val perDoc: Dataset[RegexGen.RegexDocEval] = docs.mapPartitions { it =>
      val candidates = bank.value
      // compile the bank ONCE per partition — per (doc, candidate)
      // compilation multiplied the candidate-bank compile cost by |docs|
      val compiled = candidates.map(c =>
        try Some(graft.core.CompiledPattern.compile(c.regex))
        catch { case _: Exception => None })
      val gt = gtBc.value
      it.flatMap { case (docId, text) =>
        val spans = gt.getOrElse(docId, Array.empty).toIndexedSeq
          .map { case (annId, s, e) => (annId, Span(s, e)) }
        candidates.indices.iterator.map(i =>
          RegexGen.evaluateRegexOnDoc(text, candidates(i).regex, compiled(i), labelId, spans))
      }
    }

    // R8: aggregate per regex
    val qualityByRegex = deduped.map(c => c.regex -> c.quality).toMap
    val agg = perDoc.groupByKey(_.regex).mapGroups { (regex, it) =>
      var correct = 0L; var findings = 0L; var runtime = 0.0
      var ids = Set.empty[Long]
      var precisionSum = 0.0; var f1Sum = 0.0; var n = 0
      it.foreach { e =>
        correct += e.totalCorrectFindings; findings += e.totalFindings
        runtime += e.runtimeMs; ids = ids union e.correctAnnotationIds
        precisionSum += e.annotationPrecision; f1Sum += e.f1; n += 1
      }
      RegexGen.RegexStats(regex, correct,
        if (n > 0) f1Sum / n else 0.0,
        0, // quality joined below (kept out of the shuffle)
        if (n > 0) precisionSum / n else 0.0,
        runtime, ids)
    }.collect().map(s => s.copy(quality = qualityByRegex.getOrElse(s.regex, 0)))

    // R9: greedy cover on the driver (stats are tiny)
    TrainResult(RegexGen.bestRegex(agg.toIndexedSeq), agg.toVector, deduped.length)
  }
}
