package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-time data-quality contracts (the Delta-expectations / dbt-test
  * analogue): declarative per-row predicates checked in ONE
  * map-side-combinable aggregate pass — at 10^12 rows nobody eyeballs
  * an ingest, so a corrupt batch must be caught by contract, with an
  * auditable per-check violation ledger, before it lands in a table.
  *
  * Three composition modes over the same checks:
  *  - [[ledger]]   — observe: one row per check with its violation
  *                   count (plus total rows and rows passing ALL
  *                   checks), a SINGLE aggregate over one scan.
  *  - [[dropViolations]] — quarantine: keep only rows passing every
  *                   check; pure filter, stays in the scan stage.
  *  - [[enforce]]  — gate: throw (listing every failed check and its
  *                   count) if any check has a violation, else return
  *                   the input unchanged — compose in front of
  *                   `SnapshotTable.write/merge` so a bad batch never
  *                   commits.
  *
  * Null semantics are explicit: a predicate evaluating to NULL counts
  * as a VIOLATION (contracts are affirmative — a row must prove it
  * passes), which is why checks like `n_chars === length(text)` catch
  * null-typed corruption without a separate null guard per column.
  */
object Expectations {

  private def violated(pred: Column): Column = !coalesce(pred, lit(false))

  /** One row per check: `(check, n_violations, n_rows, n_kept)` where
    * `n_kept` is the count of rows passing ALL checks. One aggregate,
    * one scan, map-side partial — the observability cost is O(checks)
    * counters per task, never a second pass over the data.
    */
  def ledger(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "expectations need at least one check")
    val aggs = checks.map { case (n, p) =>
      sum(when(violated(p), 1L).otherwise(0L)).as(s"v_$n") } ++ Seq(
      count(lit(1)).as("n_rows"),
      sum(when(checks.map(c => !violated(c._2)).reduce(_ && _), 1L)
        .otherwise(0L)).as("n_kept"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = checks.map { case (n, _) =>
      struct(lit(n).as("check"), col(s"v_$n").as("n_violations")) }
    one.select(explode(array(pairs: _*)).as("c"),
        col("n_rows"), col("n_kept"))
      .select(col("c.check").as("check"),
        col("c.n_violations").as("n_violations"),
        col("n_rows"), col("n_kept"))
  }

  /** Rows passing EVERY check (NULL predicate = violation = dropped).
    * A pure conjunction filter — pushes into the scan like any other.
    */
  def dropViolations(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "expectations need at least one check")
    df.filter(checks.map(c => !violated(c._2)).reduce(_ && _))
  }

  /** Per-row list of the check NAMES the row violates — the quarantine
    * audit column (`array<string>`, empty when the row passes all).
    */
  def failedChecks(checks: Seq[(String, Column)]): Column =
    filter(array(checks.map { case (n, p) =>
      when(violated(p), lit(n)) }: _*), x => x.isNotNull)

  /** The streaming DEAD-LETTER sink body (compose inside
    * `foreachBatch { (batch, id) => quarantineSink(batch, id, ...) }`):
    * rows passing every check append to the main table; violating rows
    * append to the quarantine table tagged with the batch id and the
    * names of the checks they failed — nothing is silently dropped,
    * and the corrupt rows stay queryable for repair/re-ingest. BOTH
    * appends key on the batch id, so a replayed micro-batch is a
    * content no-op on both tables (the CDC-sink exactly-once
    * discipline). The split predicates stay in the batch's scan; cost
    * is one pass over the micro-batch per side.
    */
  def quarantineSink(batch: DataFrame, batchId: Long,
      checks: Seq[(String, Column)], tableDir: String,
      quarantineDir: String): Unit = {
    import graft.sources.SnapshotTable
    val mode = "append"
    SnapshotTable.write(dropViolations(batch, checks), tableDir, mode,
      idempotencyKey = s"expect-good-$batchId")
    val failed = failedChecks(checks)
    val bad = batch
      .withColumn("_failed", failed)
      .filter(size(col("_failed")) > 0)
      .withColumn("_batch_id", lit(batchId))
    SnapshotTable.write(bad, quarantineDir, mode,
      idempotencyKey = s"expect-bad-$batchId"): Unit
  }

  /** The write gate: returns `df` untouched when every check passes on
    * every row, otherwise throws listing each failed check with its
    * violation count. Runs the [[ledger]] aggregate (one scan) — the
    * caller pays one pass for the guarantee that what lands in the
    * table satisfies the contract.
    */
  def enforce(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val rows = ledger(df, checks).collect()
    val failed = rows.filter(_.getLong(1) > 0)
    if (failed.nonEmpty) {
      val total = rows.headOption.map(_.getLong(2)).getOrElse(0L)
      throw new IllegalStateException(
        "expectations failed: " + failed.map(r =>
          s"${r.getString(0)} (${r.getLong(1)}/$total rows)").mkString(", "))
    }
    df
  }
}
