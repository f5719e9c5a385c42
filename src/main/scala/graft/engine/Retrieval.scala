package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over an inverted index — the BM25 complement to the
  * embedding-side ANN operators ([[Similarity]] / jobs.AnnIndexJob). A
  * pretraining pipeline uses lexical retrieval for targeted
  * decontamination sweeps ("find every document that looks like this eval
  * passage"), for data-selection probes, and as the sparse half of hybrid
  * search; at corpus scale it is the classic inverted-index plan and maps
  * onto Spark as two build exchanges plus broadcast-probe searches.
  *
  * Index build ([[buildIndex]]):
  *   - postings (term, id, tf, dl): ONE exchange — tokens of a document
  *     live in one row, so the (id, term) partial aggregation collapses
  *     map-side before the shuffle. The document length rides the same
  *     exchange as a grouping key (it is functional on id), which keeps
  *     the search path free of a corpus-wide docLens join — the same
  *     denormalization Lucene does with its per-doc norms.
  *   - termStats (term, df): vocabulary-sized aggregate of the postings.
  *   - corpus scalars (nDocs, total term count) in one action; avgdl's
  *     denominator is EVERY document, including those too short to emit a
  *     term.
  *   Both tables are eagerly materialized (localCheckpoint — same
  *   tradeoff as the dedup checkpoints: released by the ContextCleaner,
  *   loud failure on preemptible executors) so repeated searches never
  *   re-tokenize the corpus. At production scale the materialized
  *   postings ARE the index — write them out bucketed by term and
  *   searches become pruned scans, exactly the jobs.AnnIndexJob pattern
  *   on the lexical side.
  *
  * Search ([[search]]): the query set is eval-benchmark-sized, so its
  *   distinct terms BROADCAST and the postings never shuffle — the only
  *   exchange is the (query_id, doc) score aggregation over the matched
  *   postings, a tiny fraction of the corpus. Candidate SELECTION is
  *   integer set-overlap (a doc qualifies when it matches at least
  *   `minMatchNum`/`minMatchDen` of the query's distinct terms,
  *   cross-multiplied in integers — no float threshold), so the result
  *   SET is engine-exact and oracle-replayable; the BM25 score itself is
  *   a float sum and is emitted rounded, never used for set membership —
  *   the same determinism discipline as [[LangModel.scoreDocs]].
  *
  * Terms are word BIGRAMS over lowercased alphanumeric tokens — phrase
  * sensitivity without stopword lists, and the same alnum-token contract
  * as the decontamination grams (`[^a-z0-9]+` split, replayable with
  * DuckDB's string_split_regex).
  */
object Retrieval {

  /** Lowercased alphanumeric token array: split on `[^a-z0-9]+`, empties
    * dropped. The shared tokenizer contract of the gram-based operators.
    * `array_remove` rather than a `filter` lambda: same semantics (split
    * never yields nulls, so removing `""` IS the empties filter) but it
    * is an ordinary codegen-able expression — a higher-order lambda here
    * would hold the whole projection in interpreted mode.
    */
  def alnumTokens(textCol: Column): Column =
    array_remove(split(lower(textCol), "[^a-z0-9]+", -1), "")

  /** Word-bigram terms over a token array (size n-1; empty below 2).
    *
    * Shape matters: `zip_with` over two shifted slices is O(n) per row —
    * each slice evaluates the token expression once and the lambda walks
    * the two bound arrays. The index-lambda alternative
    * (`transform(sequence(...), i => element_at(toks, i+1) …)`) substitutes
    * the FULL `toks` expression into every `element_at` call, so a
    * computed `toks` (the regex tokenizer here) re-evaluates per element —
    * O(n²) interpreted work per row that profiled at 14 s for a 256k-bigram
    * corpus vs sub-second for this form (higher-order lambdas don't
    * codegen, and nothing CSEs the substituted expression).
    */
  def bigramTerms(toks: Column): Column =
    when(size(toks) >= 2,
      zip_with(slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))

  /** An inverted index: postings (term, id, tf, dl), termStats (term, df),
    * and the corpus scalars BM25 needs. Both frames are materialized.
    */
  final case class Bm25Index(postings: DataFrame, termStats: DataFrame,
      nDocs: Long, totalTerms: Long) {
    def avgDl: Double = totalTerms.toDouble / nDocs.toDouble
  }

  def buildIndex(docs: DataFrame, idCol: String, textCol: String): Bm25Index = {
    val spark = docs.sparkSession
    import spark.implicits._
    // nDocs never needs the tokenizer: count the (column-pruned) corpus
    val nDocs = docs.count()
    require(nDocs > 0L, "Retrieval.buildIndex: empty corpus")
    val base = docs.select(col(idCol).cast("long").as("id"),
      bigramTerms(alnumTokens(col(textCol))).as("terms"))
    // Per-document tf is PARTITION-LOCAL by construction (one row = one
    // document), so the postings table needs NO exchange: the previous
    // explode + groupBy(id, dl, term) shuffled every term instance of the
    // corpus to aggregate counts that a per-row hash map produces narrowly.
    // Tokenization stays in Catalyst (exact parity with the oracle's
    // expression tree); only the counting crosses the typed boundary.
    // This also collapses the old two tokenize passes (count/sum action +
    // postings build) into the ONE pass the checkpoint materializes —
    // totalTerms = Σ tf is read back from the checkpointed postings.
    val postings = base
      .as[(java.lang.Long, Seq[String])]
      .mapPartitions(_.flatMap { case (boxedId, terms) =>
        // loud contract: ids must be non-null and castable to long (the
        // old explode+groupBy silently grouped a null id; an index keyed
        // on null is a caller bug either way)
        if (boxedId == null) throw new IllegalArgumentException(
          "Retrieval.buildIndex: null id (idCol must be non-null and castable to long)")
        val id = boxedId.longValue()
        val dl = terms.length
        val tf = new java.util.LinkedHashMap[String, Long]()
        terms.foreach(t => tf.merge(t, 1L, (a, b) => a + b))
        val it = tf.entrySet().iterator()
        new Iterator[(Long, Int, String, Long)] {
          override def hasNext: Boolean = it.hasNext
          override def next(): (Long, Int, String, Long) = {
            val e = it.next()
            (id, dl, e.getKey, e.getValue)
          }
        }
      })
      .toDF("id", "dl", "term", "tf")
      .localCheckpoint(true)
    val totalTerms = postings.agg(coalesce(sum(col("tf")), lit(0L)).cast("long"))
      .head.getLong(0)
    val termStats = postings.groupBy("term")
      .agg(count(lit(1)).as("df"))
      .localCheckpoint(true)
    Bm25Index(postings, termStats, nDocs, totalTerms)
  }

  /** Score every (query, candidate) pair whose integer term overlap
    * reaches `minMatchNum / minMatchDen` of the query's distinct terms.
    * Output: (query_id, id, qn, n_matched, tf_mass, score) — qn /
    * n_matched / tf_mass integer-exact, score the float BM25 sum
    * (Robertson/Sparck-Jones idf in the Lucene `ln(1 + (N-df+0.5)/(df+0.5))`
    * form, k1/b defaults 1.2/0.75).
    */
  def search(index: Bm25Index, queries: DataFrame, minMatchNum: Int = 3,
      minMatchDen: Int = 5, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qt = queryTerms(queries)
    // qt joins FIRST (it filters the postings down to matched rows), the
    // vocabulary-sized df table joins the survivors
    val matched = index.postings
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(index.termStats), Seq("term"))
    scoreMatched(matched, index.nDocs, index.avgDl, minMatchNum, minMatchDen, k1, b)
  }

  /** Distinct (query_id, term, qn) of a query frame — benchmark-sized, the
    * broadcast probe side of every search path (in-memory and persisted).
    */
  def queryTerms(queries: DataFrame): DataFrame = {
    val qterms = queries.select(col("query_id").cast("long").as("query_id"),
      explode(array_distinct(bigramTerms(alnumTokens(col("qtext"))))).as("term"))
    qterms.join(qterms.groupBy("query_id").agg(count(lit(1)).as("qn")), "query_id")
  }

  /** The shared BM25 scoring kernel over matched postings rows — columns
    * (query_id, id, qn, tf, dl, df) however the caller produced them
    * (in-memory broadcast joins in [[search]]; a bucket-pruned index read
    * in jobs.RetrievalIndexJob). One (query, doc) aggregation exchange
    * over the matched rows; integer overlap filter decides membership.
    */
  def scoreMatched(matched: DataFrame, nDocs: Long, avgDl: Double,
      minMatchNum: Int, minMatchDen: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(minMatchDen > 0 && minMatchNum >= 0,
      s"Retrieval.scoreMatched: bad overlap fraction $minMatchNum/$minMatchDen")
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    matched
      .groupBy(col("query_id"), col("id"), col("qn"))
      .agg(
        count(lit(1)).as("n_matched"),
        sum(col("tf")).as("tf_mass"),
        sum(idf * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
            lit(b) * col("dl") / lit(avgDl)))).as("score"))
      .filter(col("n_matched") * lit(minMatchDen) >= col("qn") * lit(minMatchNum))
  }

  /** Per-query top-k over a scored candidate set (window over the
    * candidates — benchmark-sized, never the corpus; ties break on id so
    * reruns are stable).
    */
  def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
