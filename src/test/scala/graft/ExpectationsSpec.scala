package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Expectations
import graft.sources.SnapshotTable

/** Data-quality contract semantics (ledger/drop/enforce) and the
  * refuse-commit composition with the snapshot table (the driver gate
  * `tx_expectations` covers DuckDB value parity of the ledger).
  */
class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows = Seq(
    (Some(1L), Some("ok")),
    (Some(2L), Some("")),
    (None, Some("ok")),          // null id → violates id check
    (Some(4L), None)             // null text → NULL predicate = violation
  ).toDF("id", "text")

  private def checks = Seq(
    "id_present" -> col("id").isNotNull,
    "text_nonempty" -> (length(col("text")) > 0))

  test("ledger: one row per check, null predicate counts as violation") {
    val got = Expectations.ledger(rows, checks).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toList == List(
      ("id_present", 1L, 4L, 1L),      // row 3
      ("text_nonempty", 2L, 4L, 1L)))  // rows 2 (empty) and 4 (null)
  }

  test("ledger: ONE aggregate pass — a single Exchange in the plan") {
    val plan = Expectations.ledger(rows, checks)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("dropViolations keeps exactly the pass-all rows") {
    val kept = Expectations.dropViolations(rows, checks)
      .select("id").collect().map(_.getLong(0)).toList
    assert(kept == List(1L))
  }

  test("enforce: passes clean data through, names every failed check") {
    val clean = rows.filter(col("id") === 1L)
    assert(Expectations.enforce(clean, checks).count() == 1)
    val e = intercept[IllegalStateException] {
      Expectations.enforce(rows, checks).count()
    }
    assert(e.getMessage.contains("id_present (1/4"), e.getMessage)
    assert(e.getMessage.contains("text_nonempty (2/4"), e.getMessage)
  }

  test("enforce fronts a snapshot-table write: a bad batch never commits") {
    val dir = java.nio.file.Files.createTempDirectory("snapexp").toString + "/t"
    SnapshotTable.write(
      Expectations.enforce(rows.filter(col("id") === 1L), checks), dir,
      idempotencyKey = "good")
    val before = SnapshotTable.currentSnapshot(dir)
    intercept[IllegalStateException] {
      SnapshotTable.write(Expectations.enforce(rows, checks), dir,
        mode = "append", idempotencyKey = "bad")
    }
    // the contract threw BEFORE any commit: same snapshot, same content
    assert(SnapshotTable.currentSnapshot(dir) == before)
    assert(SnapshotTable.read(spark, dir).count() == 1)
  }
}
