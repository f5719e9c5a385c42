package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application over a corpus
  * (Sennrich et al., ACL 2016 — "Neural Machine Translation of Rare Words
  * with Subword Units"): learn a merge table from corpus statistics, then
  * segment text with it.
  *
  * Scale shape: everything runs over the DISTINCT-WORD table, not the
  * corpus — web-scale corpora have ~10^7–10^8 distinct alnum words vs
  * 10^12+ tokens, so one corpus-wide tokenize+groupBy collapses the
  * problem a million-fold before any iteration. Each training round is a
  * distributed pair-count over that word table (partial-agg friendly:
  * explode → groupBy(pair) → sum) plus ONE 1-row collect (the argmax
  * pair); the re-symbolized word table is localCheckpoint'd so lineage
  * stays one round deep (the [[LinkGraph.pageRank]] discipline). Encoding
  * applies the learned merges per word — a narrow kernel, broadcast
  * merge list.
  */
object Bpe {

  /** Distinct-word frequencies of `textCol` under the engine's alnum
    * tokenizer: `(word, cnt)` — the corpus collapse every other stage
    * feeds from. One shuffle on word with map-side partials.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Retrieval.alnumTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("cnt"))

  /** Adjacent symbol-pair counts over a symbolized word table
    * `(word, cnt, syms)`, weighted by word frequency — duplicate pairs
    * inside one word count once each ("aaa" holds TWO "a·a" pairs).
    * `(left, right, pair_cnt)`; one shuffle on the pair key.
    */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("cnt"),
        // zip_with over shifted slices: O(n) per row (Retrieval.bigramTerms'
        // hard-learned shape — an index lambda re-evaluates syms per element)
        when(size(col("syms")) >= 2,
          zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("left"), b.as("right"))))
          .otherwise(array().cast("array<struct<left:string,right:string>>"))
          .as("pairs"))
      .select(col("cnt"), explode(col("pairs")).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum("cnt").as("pair_cnt"))

  /** Initial symbolization: one single-char symbol per char. */
  def symbolize(wordCounts: DataFrame): DataFrame =
    wordCounts.select(col("word"), col("cnt"),
      array_remove(split(col("word"), "", -1), "").as("syms"))

  /** Apply one merge (left,right → left+right) to a symbol sequence,
    * leftmost-first non-overlapping — the BPE application rule.
    */
  def applyMerge(syms: IndexedSeq[String], left: String, right: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == left && syms(i + 1) == right) {
        out += left + right; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Segment one word with an ordered merge table (applied in training
    * order — Sennrich's encode).
    */
  def encodeWord(word: String, merges: IndexedSeq[(String, String)]): IndexedSeq[String] = {
    var syms: IndexedSeq[String] = word.map(_.toString)
    var i = 0
    while (i < merges.length && syms.length >= 2) {
      syms = applyMerge(syms, merges(i)._1, merges(i)._2)
      i += 1
    }
    syms
  }

  /** Train `k` merges on the corpus: each round counts pairs distributed,
    * collects the single best pair (count desc, then (left, right) asc —
    * a total order, so the merge table is deterministic at any
    * parallelism), and re-symbolizes the word table with a narrow map.
    * Returns the merge table `(step, left, right, pair_cnt)`. Stops early
    * when no pair remains.
    */
  def trainMerges(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    var words = symbolize(wordCounts(df, textCol)).localCheckpoint(true)
    val merges = Vector.newBuilder[(Int, String, String, Long)]
    var step = 0
    var exhausted = false
    while (step < k && !exhausted) {
      val best = pairCounts(words)
        .orderBy(col("pair_cnt").desc, col("left"), col("right"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val l = best(0).getString(0)
        val r = best(0).getString(1)
        merges += ((step, l, r, best(0).getLong(2)))
        words = words
          .select(col("word"), col("cnt"), col("syms"))
          .as[(String, Long, Seq[String])]
          .map { case (w, c, s) => (w, c, applyMerge(s.toIndexedSeq, l, r)) }
          .toDF("word", "cnt", "syms")
          .localCheckpoint(true)
        step += 1
      }
    }
    spark.createDataFrame(merges.result()).toDF("step", "left", "right", "pair_cnt")
  }

  /** Deterministic id table for a merge list: the 36 alnum base symbols
    * ('0'-'9' then 'a'-'z', ids 0-35 — [[Retrieval.alnumTokens]] lowercases
    * and splits on `[^a-z0-9]+`, so no other character can reach the
    * encoder) followed by each merge's output in training order (ids
    * 36+step). The standard BPE vocab construction: chars + merges.
    * Outputs must be distinct (length-1 base vs length>=2 outputs can
    * never collide; duplicate merge outputs are refused loudly).
    */
  def vocabIds(merges: IndexedSeq[(String, String)]): Map[String, Int] = {
    val base = (('0' to '9') ++ ('a' to 'z')).map(_.toString)
    val outs = merges.map { case (l, r) => l + r }
    require(outs.distinct.length == outs.length,
      s"duplicate merge outputs in the merge table: $outs")
    (base ++ outs).zipWithIndex.toMap
  }

  /** Per-document token-ID sequence under an ordered merge list — the
    * actual training artifact (ids, not counts): `(id, n_bpe_tokens,
    * token_ids)` with the ids space-joined into one string (exact to
    * compare, layout-stable to store; a production sink would write the
    * equivalent ARRAY<INT> column). Merges and vocab ship in the closure
    * (KBs); the corpus side is one narrow kernel with the same
    * per-partition distinct-word memo as [[tokenCounts]]. A word symbol
    * missing from the vocab is impossible by construction (the tokenizer's
    * alphabet IS the base vocab) and fails loudly if the invariant breaks.
    */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
      merges: IndexedSeq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = vocabIds(merges)
    df.select(col(idCol).cast("long"), Retrieval.alnumTokens(col(textCol)).as("w"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, Array[Int]]()
        it.map { case (id, ws) =>
          val out = new StringBuilder
          var total = 0L
          ws.foreach { w =>
            var ids = memo.get(w)
            if (ids == null) {
              ids = encodeWord(w, merges).map { s =>
                vocab.getOrElse(s, sys.error(
                  s"BPE symbol '$s' of word '$w' missing from the vocab"))
              }.toArray
              memo.put(w, ids)
            }
            ids.foreach { i =>
              if (out.nonEmpty) out += ' '
              out.append(i)
            }
            total += ids.length
          }
          (id, total, out.toString)
        }
      }
      .toDF(idCol, "n_bpe_tokens", "token_ids")
  }

  /** Per-document BPE token count under an ordered merge list: the
    * downstream budget every packing/pricing stage needs. Merges ship in
    * the closure (KBs); the corpus side is one narrow kernel — encode
    * every word of every doc, sum. `(id, n_words, n_bpe_tokens)`.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: IndexedSeq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), Retrieval.alnumTokens(col(textCol)).as("w"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        // per-partition word→count memo: web text repeats words heavily,
        // and encode cost is per DISTINCT word this way
        val memo = new java.util.HashMap[String, Int]()
        it.map { case (id, ws) =>
          var total = 0L
          ws.foreach { w =>
            var n = memo.getOrDefault(w, -1)
            if (n < 0) { n = encodeWord(w, merges).length; memo.put(w, n) }
            total += n
          }
          (id, ws.length.toLong, total)
        }
      }
      .toDF(idCol, "n_words", "n_bpe_tokens")
  }
}
