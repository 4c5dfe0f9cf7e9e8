package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-side text operators — the serving counterparts of the
  * tf-idf / ANN family: an inverted-index build and BM25 ranking.
  * Additions beyond the reference surface (training-data pipeline
  * operators per the rebuild brief); both are pure Catalyst.
  *
  * Scale posture: the inverted index is the classic hot-key hazard —
  * a stopword's posting list is O(corpus). The build therefore
  * computes document frequency FIRST (a map-side-combinable count),
  * drops terms above a `maxDf` cap BEFORE any posting list
  * materializes (the LSH bucket-cap convention: an explicit policy
  * with kept/dropped accounting, not an OOM surprise), and only then
  * collects the surviving lists. BM25 never builds lists at all: the
  * per-document statistics (dl, per-query-term tf) are computed in
  * the scan stage with higher-order array functions; the ONLY
  * exchange is the one-row corpus aggregate (N, avgdl, df per term),
  * which is broadcast back, and the final top-k is a TakeOrdered —
  * no global sort, no join on a corpus-scale key.
  */
object Retrieval {

  /** Per-document, per-term stats: one row per (doc, distinct term).
    * `array_distinct` runs inside the scan, so the explode emits each
    * (doc, term) once — the groupBy that follows sees pre-deduplicated
    * pairs and its partial aggregation is exact.
    */
  private def docTerms(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextOps.tokens(TextOps.normalizeText(col(textCol)))))
        .as("term"))

  /** Inverted index: `term → (df, postings)` with doc ids ascending,
    * restricted to terms whose document frequency is ≤ `maxDf`.
    * Returns `(index, ledger)`: the ledger is a 1-row frame with
    * `n_terms_total / n_terms_kept / n_docs_dropped` so a capped build
    * is auditable (silent truncation reads as full coverage).
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long = Long.MaxValue): (DataFrame, DataFrame) = {
    val dt = docTerms(docs, idCol, textCol)
    val dfreq = dt.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val kept = dfreq.filter(col("df") <= maxDf)
    // posting lists only ever materialize for under-cap terms; the
    // hot terms never reach the collect_list
    val index = dt.join(broadcastIfDim(kept), Seq("term"))
      .groupBy(col("term"), col("df"))
      .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
    val ledger = dfreq.agg(
      count(lit(1)).as("n_terms_total"),
      sum(when(col("df") <= maxDf, 1L).otherwise(0L)).as("n_terms_kept"),
      coalesce(sum(when(col("df") > maxDf, col("df"))), lit(0L))
        .as("n_postings_dropped"))
    (index, ledger)
  }

  /** Broadcast hint for the kept-term dimension: the term vocabulary
    * is fixed-size at any corpus scale (it is bounded by the language,
    * not the data), so the semi-filtering join is always broadcastable.
    */
  private def broadcastIfDim(df: DataFrame): DataFrame = broadcast(df)

  /** BM25 top-k with a RATIONAL idf substitute: classic BM25 uses
    * `ln((N - df + 0.5) / (df + 0.5))`; this uses the log's argument
    * directly. Per term the transform is strictly monotone in df (the
    * quantity BM25's idf orders by), and it removes the one operation
    * (libm `log`) whose low bits differ across engines — every
    * remaining op (+,-,*,/) is IEEE-754 correctly-rounded, so the
    * score is BIT-EXACT against any engine that mirrors the operation
    * order. That is what lets the driver gate hash doubles directly
    * (the cosine-gate convention) instead of rounding.
    *
    * Per-term score, written in the exact evaluation order both
    * engines must follow:
    * {{{
    *   idf  = ((N - df) + 0.5) / (df + 0.5)
    *   norm = tf + k1 * ((1 - b) + b * (dl / avgdl))
    *   s    = idf * ((tf * (k1 + 1)) / norm)      // 0 when tf = 0
    *   score = s(t1) + s(t2) + ...                // fixed written order
    * }}}
    * `k1Plus1` is taken as its own literal (not computed from k1) so
    * both engines parse the same decimal literal to the same double.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, k1Plus1: Double = 2.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 8, "1-8 query terms")
    val toks = TextOps.tokens(TextOps.normalizeText(col(textCol)))
    def tfCol(t: String): Column =
      size(filter(toks, x => x === lit(t))).cast("long")
    // per-doc stats, all inside the scan stage
    val perDoc = docs.select(
      (Seq(col(idCol).as("doc_id"),
        TextOps.tokenCount(col(textCol)).cast("long").as("dl")) ++
        terms.zipWithIndex.map { case (t, i) => tfCol(t).as(s"tf$i") }): _*)
      // materialized once: the corpus-stats aggregate AND the scoring
      // probe both consume the tokenize scan — narrow per-doc rows, so
      // the checkpoint is doc-count-sized, never token-sized
      .localCheckpoint(true)
    // the single exchange: one corpus-wide row (map-side combined)
    val statAggs = Seq(count(lit(1)).as("n"), sum(col("dl")).as("sdl")) ++
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val joined = perDoc.crossJoin(broadcast(stats))
    val avgdl = col("sdl").cast("double") / col("n").cast("double")
    def termScore(i: Int): Column = {
      val dfT = col(s"df$i").cast("double")
      val tf = col(s"tf$i").cast("double")
      val idf = ((col("n").cast("double") - dfT) + lit(0.5)) / (dfT + lit(0.5))
      val norm = tf + lit(k1) * ((lit(1.0) - lit(b)) +
        lit(b) * (col("dl").cast("double") / avgdl))
      idf * ((tf * lit(k1Plus1)) / norm)
    }
    val score = terms.indices.map(termScore).reduce(_ + _)
    joined
      .select((Seq(col("doc_id"), col("dl")) ++
        terms.indices.map(i => col(s"tf$i")) :+ score.as("score")): _*)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }
}
