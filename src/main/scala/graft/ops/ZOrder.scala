package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the data-layout transform behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave the bits of two key
  * columns so range-partitioning on the interleaved value co-locates
  * rows that are close in BOTH dimensions. Files written from a
  * z-clustered layout have tight min/max boxes on both columns at
  * once, so a 2-dimensional predicate box prunes files through the
  * manifest stats (`SnapshotTable.readBox`) — a single-column sort
  * can only ever prune one of the two dimensions.
  *
  * At 100 TB this is what makes "orders for customer range C in order
  * range O" open a handful of files instead of every file that
  * matches either dimension alone. The interleave is a pure bitwise
  * Column expression (shift/or fold, whole-stage codegen'd) — no UDF.
  */
object ZOrder {

  /** Morton-interleave two non-negative long columns, `bits` bits each
    * (bit i of `a` lands at position 2i, of `b` at 2i+1 — up to 31
    * bits/column fits the 63-bit positive long range). Values are
    * masked to `bits` bits; callers pick `bits` to cover their domain.
    */
  def zvalue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Range-partition `df` into `numFiles` z-ordered blocks on
    * (`colA`, `colB`) — each output partition (= data file when
    * written) covers a contiguous Morton range, i.e. a small set of
    * 2-D tiles. The z column is dropped after partitioning; pair with
    * `SnapshotTable.write(..., statsCols = Seq(colA, colB))` so the
    * manifest records each file's 2-D bounding box.
    */
  def cluster(df: DataFrame, colA: String, colB: String,
      numFiles: Int, bits: Int = 21): DataFrame =
    df.withColumn("_z", zvalue(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
}
