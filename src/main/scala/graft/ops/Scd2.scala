package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension maintenance: the batch run-collapse
  * ([[runs]], the ev_scd2 query body) and its INCREMENTAL twin
  * ([[applyIncrement]]) that folds a strictly-later event batch into a
  * persisted SCD2 snapshot table by rewriting ONLY the affected users'
  * OPEN rows — the dimension-history analogue of the incremental-LSH /
  * HLL maintenance family.
  *
  * Increment contract: per user, every new event's ts must be ≥ that
  * user's last ingested ts (a time-ordered feed — exactly what a
  * watermarked stream provides). Under it, incremental == full batch
  * rebuild EXACTLY: the open run either extends (same state) or closes
  * at the first new event's ts, and later runs append; closed rows are
  * immutable, so the merge touches ≤ 1 existing row per affected user.
  * At 100 TB the increment costs O(batch + affected open rows): the
  * table's closed history is never read, let alone rewritten
  * (SnapshotTable.merge stats-prunes untouched files).
  */
object Scd2 {

  /** events(user_id, ts, event_id, event_type) → one row per
    * consecutive-equal-state run: (user_id, version, state, valid_from,
    * valid_to, n_events, is_current). ONE hash exchange: every window
    * and the run groupBy cluster on a superset of user_id (pinned in
    * PlanSpec). `weightCol` lets a caller fold pre-aggregated pseudo
    * events in (used by the incremental path); plain events weigh 1.
    */
  def runs(events: DataFrame, weightCol: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val weighted = weightCol.fold(events.withColumn("_w", lit(1L)))(c =>
      events.withColumn("_w", col(c)))
    weighted
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("chg",
        when(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("version",
        sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("version"), col("event_type"))
      .agg(min(col("ts")).as("valid_from"), sum(col("_w")).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("version"))))
      .select(col("user_id"), col("version"),
        col("event_type").as("state"), col("valid_from"), col("valid_to"),
        col("n_events"), col("valid_to").isNull.as("is_current"))
  }

  /** Fold a strictly-later event batch into the SCD2 snapshot table at
    * `dimDir` (schema = [[runs]] output, keys (user_id, version)).
    * Exactly-once under replays via `idempotencyKey` (the merge's CAS
    * discipline). Returns the committed snapshot id.
    */
  def applyIncrement(spark: SparkSession, dimDir: String,
      newEvents: DataFrame, idempotencyKey: String): Long = {
    import graft.sources.SnapshotTable
    // a REPLAY of an already-committed increment must no-op before the
    // order guard runs: after the original commit the open runs have
    // advanced past this batch, so the guard would (correctly, for a
    // genuinely NEW batch) reject what is actually the same batch again
    val already = SnapshotTable.snapshotWithKey(dimDir, idempotencyKey)
    if (already.isDefined) return already.get
    val users = newEvents.select(col("user_id")).distinct()
    // ≤ 1 open row per affected user; dimension-scale, not history-scale
    val open = SnapshotTable.read(spark, dimDir)
      .filter(col("valid_to").isNull)
      .join(users, Seq("user_id"), "left_semi")
    // ENFORCE the time-ordered-feed contract (the IncrementalDedup
    // requireInOrderKey convention — a violated precondition must fail
    // loudly, not corrupt silently): an increment event older than its
    // user's OPEN run start would splice history the closed rows
    // already encode. Detectable violations (ts < open valid_from) are
    // refused outright. CONTRACT SCOPE: only events ≥ the open run's
    // LAST ingested event are guaranteed batch-equivalent. The dimension
    // row does not store that last ts, so an in-run late event
    // (valid_from ≤ ts < last ingested ts) passes the guard and is
    // folded against the open run COLLAPSED at valid_from — it cannot
    // re-interleave with the open run's post-valid_from events the way
    // a full rebuild would. A watermarked feed never produces such an
    // event; feeds that can must carry a per-user high-water mark and
    // refuse below it.
    val stale = newEvents
      .join(open.select(col("user_id"), col("valid_from")), Seq("user_id"))
      .filter(col("ts") < col("valid_from"))
    val nStale = stale.count()
    require(nStale == 0,
      s"out-of-order increment: $nStale event(s) predate their user's " +
        "open run — replay order violates the time-ordered-feed contract")
    // the open run re-enters the fold as ONE pseudo event carrying its
    // accumulated weight; event_id -1 sorts it before any real event at
    // the same ts, and its ts (= valid_from) precedes the increment by
    // the time-ordered-feed contract
    val pseudo = open.select(col("user_id"), col("valid_from").as("ts"),
      lit(-1L).as("event_id"), col("state").as("event_type"),
      col("n_events").as("_w"))
    val combined = newEvents
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        lit(1L).as("_w"))
      .unionByName(pseudo)
    val baseV = open.select(col("user_id"), col("version").as("_v0"))
    val upserts = runs(combined, weightCol = Some("_w"))
      .join(baseV, Seq("user_id"), "left")
      // local run 1 IS the open run (or run 1 of a brand-new user)
      .withColumn("version", col("version") + coalesce(col("_v0"), lit(1L)) - 1L)
      .drop("_v0")
    SnapshotTable.merge(spark, dimDir, upserts, Seq("user_id", "version"),
      idempotencyKey = idempotencyKey)
  }
}
