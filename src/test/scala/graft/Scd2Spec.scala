package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Scd2
import graft.sources.SnapshotTable

/** Incremental SCD2 maintenance: multi-increment == full batch on real
  * events, open-run extension vs close-out on toy data, and replay
  * idempotency of the increment commit.
  */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events = spark.read
    .parquet("/root/testdata/sf0.001/events.parquet")
    .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("user_id"), col("version"), col("state"),
        col("valid_from"), col("valid_to"), col("n_events"),
        col("is_current"))
      .orderBy(col("user_id"), col("version"))
      .collect().toSeq

  test("three increments equal the full-batch rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("scd2i").toString + "/t"
    val e = events
    val maxId = e.agg(max(col("event_id"))).head().getLong(0)
    val (c1, c2) = (maxId / 3, 2 * maxId / 3)
    SnapshotTable.write(Scd2.runs(e.filter(col("event_id") <= c1)), dir,
      idempotencyKey = "b")
    Scd2.applyIncrement(spark, dir,
      e.filter(col("event_id") > c1 && col("event_id") <= c2), "i1")
    Scd2.applyIncrement(spark, dir, e.filter(col("event_id") > c2), "i2")
    assert(sortedRows(SnapshotTable.read(spark, dir)) ===
      sortedRows(Scd2.runs(e)))
  }

  test("open run extends on same state, closes on a new state") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val dir = java.nio.file.Files.createTempDirectory("scd2t").toString + "/t"
    val base = Seq((1L, ts(0), 1L, "a"), (1L, ts(1), 2L, "a"),
      (2L, ts(0), 3L, "x"))
      .toDF("user_id", "ts", "event_id", "event_type")
    SnapshotTable.write(Scd2.runs(base), dir, idempotencyKey = "b")
    // user 1: two more "a" events extend the open run (n_events 2 → 4);
    // user 2: a "y" closes the open "x" run and opens version 2;
    // user 3: brand new, starts at version 1
    val inc = Seq((1L, ts(2), 4L, "a"), (1L, ts(3), 5L, "a"),
      (2L, ts(2), 6L, "y"), (3L, ts(2), 7L, "z"))
      .toDF("user_id", "ts", "event_id", "event_type")
    Scd2.applyIncrement(spark, dir, inc, "i1")
    val got = sortedRows(SnapshotTable.read(spark, dir))
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getLong(5),
        r.getBoolean(6)))
    assert(got === Seq(
      (1L, 1L, "a", ts(0), None, 4L, true),
      (2L, 1L, "x", ts(0), Some(ts(2)), 1L, false),
      (2L, 2L, "y", ts(2), None, 1L, true),
      (3L, 1L, "z", ts(2), None, 1L, true)))
  }

  test("out-of-order increment fails loudly instead of splicing history") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val dir = java.nio.file.Files.createTempDirectory("scd2o").toString + "/t"
    val base = Seq((1L, ts(0), 1L, "a"), (1L, ts(5), 2L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    SnapshotTable.write(Scd2.runs(base), dir, idempotencyKey = "b")
    // event at minute 3 predates the open "b" run (valid_from = :05)
    val late = Seq((1L, ts(3), 9L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val ex = intercept[IllegalArgumentException] {
      Scd2.applyIncrement(spark, dir, late, "late")
    }
    assert(ex.getMessage.contains("out-of-order"))
    // an event at/after the open run's LAST ingested event is legal and
    // equals the full rebuild (the guaranteed contract scope — see the
    // applyIncrement comment: an in-run event EARLIER than the last
    // ingested one passes the guard but is folded against the collapsed
    // open run, which a full rebuild would interleave differently)
    val inRun = Seq((1L, ts(6), 10L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    Scd2.applyIncrement(spark, dir, inRun, "ok")
    assert(sortedRows(SnapshotTable.read(spark, dir)) ===
      sortedRows(Scd2.runs(base.unionByName(inRun))))
  }

  test("replaying an increment with the same idempotency key is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("scd2r").toString + "/t"
    val e = events
    val cut = e.agg(max(col("event_id"))).head().getLong(0) / 2
    SnapshotTable.write(Scd2.runs(e.filter(col("event_id") <= cut)), dir,
      idempotencyKey = "b")
    val inc = e.filter(col("event_id") > cut)
    val snap1 = Scd2.applyIncrement(spark, dir, inc, "i1")
    val rows1 = sortedRows(SnapshotTable.read(spark, dir))
    val snap2 = Scd2.applyIncrement(spark, dir, inc, "i1")
    assert(snap1 === snap2)
    assert(sortedRows(SnapshotTable.read(spark, dir)) === rows1)
  }
}
