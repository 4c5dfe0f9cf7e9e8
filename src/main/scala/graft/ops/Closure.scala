package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive-closure via PATH DOUBLING over a DataFrame edge list —
  * the log-round closure for deep hierarchies (RDFS subClassOf*,
  * SPARQL property paths `p+`): round r joins the reachability
  * relation with ITSELF, extending covered min-depths from 2^(r-1) to
  * 2^r, so a depth-D graph closes in ceil(log2 D) shuffle rounds
  * instead of D semi-naive iterations. Each round is one equi-join +
  * one min-aggregate over PAIR-scale state (never corpus-scale rows),
  * localCheckpointed so round r+1 replays zero lineage — the
  * CC/PageRank iterative-DataFrame discipline.
  *
  * min(depth) keeps the shortest derivation per (node, ancestor) pair;
  * on a DAG the loop is exact once 2^rounds ≥ the max finite
  * min-depth. Cyclic inputs are the caller's contract to exclude
  * (like SQL recursive CTEs, the relation would keep growing).
  */
object Closure {

  /** edges(child, parent) → closure(node, anc, depth) with depth = the
    * MINIMUM number of edges from node up to anc. Exact for all pairs
    * whose min-depth ≤ 2^rounds.
    */
  def transitive(edges: DataFrame, rounds: Int): DataFrame = {
    var anc = edges.select(col("child").as("node"),
      col("parent").as("anc"), lit(1L).as("depth"))
    for (_ <- 1 to rounds) {
      val left = anc.toDF("node", "mid", "d1")
      val right = anc.toDF("mid", "anc", "d2")
      val ext = left.join(right, "mid")
        .select(col("node"), col("anc"), (col("d1") + col("d2")).as("depth"))
      anc = anc.union(ext)
        .groupBy(col("node"), col("anc"))
        .agg(min(col("depth")).as("depth"))
        .localCheckpoint(true)
    }
    anc
  }

  /** Reference semantics for the spec gate: single-step semi-naive
    * iteration to a fixpoint (the O(D)-round formulation path doubling
    * replaces). Intentionally the SLOW shape — used only on toy inputs
    * to pin [[transitive]]'s algebra.
    */
  private[graft] def naive(edges: DataFrame, maxRounds: Int): DataFrame = {
    val base = edges.select(col("child").as("node"),
      col("parent").as("anc"), lit(1L).as("depth"))
    var anc = base
    var last = -1L
    var n = anc.count()
    var i = 0
    while (n != last && i < maxRounds) {
      val ext = anc.toDF("node", "mid", "d1")
        .join(base.toDF("mid", "anc", "d2"), "mid")
        .select(col("node"), col("anc"), (col("d1") + col("d2")).as("depth"))
      anc = anc.union(ext)
        .groupBy(col("node"), col("anc"))
        .agg(min(col("depth")).as("depth"))
        .localCheckpoint(true)
      last = n; n = anc.count(); i += 1
    }
    anc
  }
}
