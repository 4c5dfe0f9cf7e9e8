package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines:
  * hash-bucket train/val/test assignment and per-source mixture
  * sampling.
  *
  * Everything derives from a salted md5 of the row key (the same
  * engine-portable construction as [[Dedup.hash60]]), so the decision
  * for a given record is a pure function of its id — stable across
  * runs, partitionings, cluster sizes, and engines (the DuckDB oracle
  * reproduces it bit-for-bit). That is the property a 100 TB pipeline
  * needs: re-running the split after adding data never reshuffles
  * previously assigned records, and no shuffle/coordination is needed
  * at all — the whole operator is a map-side projection that fuses
  * into the scan's WholeStageCodegen span.
  */
object Sampling {

  /** Uniform 0..99 bucket from a salted md5 of the key. The salt keeps
    * independent decisions independent (the split bucket and the
    * sampling bucket of one doc are uncorrelated).
    */
  def hashBucket(salt: String, key: Column): Column =
    pmod(Dedup.hash60(concat(lit(salt + ":"), key.cast("string"))), lit(100L))

  /** Train/val/test label from a 0..99 bucket: [0, testPct) = test,
    * [testPct, testPct+valPct) = val, rest = train.
    */
  def splitAssign(bucket: Column, testPct: Int, valPct: Int): Column =
    when(bucket < testPct, "test")
      .when(bucket < testPct + valPct, "val")
      .otherwise("train")

  /** Per-source mixture weight in 1..99 percent, derived
    * deterministically from the source name (a stand-in for a
    * configured source→weight table; broadcast-join a real one the
    * same way).
    */
  def sourcePct(source: Column): Column =
    pmod(Dedup.hash60(concat(lit("w:"), source)), lit(99L)) + 1

  /** True iff the record survives mixture sampling at `pct` percent:
    * its own sampling bucket falls below the source's weight.
    */
  def mixtureKeep(key: Column, pct: Column): Column =
    hashBucket("mixdoc", key) < pct

  /** Deterministic per-domain cap rank: a record's position within its
    * domain when the domain's records are ordered by salted hash (ties
    * by key). Keeping rank ≤ cap is the crawl-pipeline domain-cap
    * operator: an unbiased, re-run-stable "random" cap — which records
    * survive depends only on their hashes, not on arrival order or
    * partitioning.
    *
    * The rank is a window over (domain) — ONE shuffle partitioned by
    * domain. At 100 TB the lever for a mega-domain is a pre-filter:
    * count per domain, broadcast the per-domain count, and drop rows
    * whose hash exceeds ~(cap/count)-quantile BEFORE the window so the
    * hot partition ranks ~cap rows instead of billions (AQE skew-join
    * handles the residual imbalance).
    */
  def domainCapRank(domain: Column, key: Column): Column =
    row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(domain)
        .orderBy(
          Dedup.hash60(concat(lit("domcap:"), key.cast("string"))).asc,
          key.asc))

  /** Weighted-sampling priority with ZERO float arithmetic — the
    * Efraimidis–Spirakis reservoir realized as a minimum of hash
    * replicas: a row with integer weight w ∈ [1, maxW] gets the MIN of
    * w independent salted 60-bit hashes. For any two rows,
    * P(prio_i < prio_j) = w_i / (w_i + w_j) — exactly A-ES's pairwise
    * selection property (min of w iid uniforms ~ Beta(1, w)) — so
    * taking the k SMALLEST priorities is a weighted sample without
    * replacement. All-integer means the DuckDB oracle reproduces the
    * survivor set bit-for-bit (no pow/ln whose last-ulp could differ
    * across libm implementations), and the decision stays a pure
    * function of (key, weight): re-run-stable, partition-independent.
    *
    * Shape at 100 TB: a bounded per-row explode (≤ maxW hashes folded
    * by array_min INSIDE the projection — no rows are emitted), fused
    * into the scan; the only wide operation a consumer adds is the
    * top-k, which compiles to TakeOrderedAndProject.
    */
  def weightedPriority(key: Column, weight: Column): Column =
    array_min(transform(
      sequence(lit(0L), weight.cast("long") - 1),
      r => Dedup.hash60(concat(lit("wsamp:"), key.cast("string"),
        lit(":"), r.cast("string")))))
}
