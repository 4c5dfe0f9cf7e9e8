package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Kmv

/** KMV sketch aggregator: partition-order invariance (the sketch is a
  * true bounded-state aggregate), duplicate absorption, and estimate
  * sanity on sets far above k.
  */
class KmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sketch equals the exact bottom-k of distinct hashes, any partitioning") {
    val k = 16
    val vals = (1 to 500).map(i => (i * 2654435761L) & ((1L << 60) - 1))
    val dups = vals ++ vals.take(100) // duplicates must be absorbed
    val want = vals.distinct.sorted.take(k)
    for (parts <- Seq(1, 3, 13)) {
      val got = dups.toDF("h").repartition(parts)
        .agg(Kmv.sketch(col("h"), k).as("sk"))
        .head().getSeq[Long](0)
      assert(got === want, s"parts=$parts")
    }
  }

  test("small sets stay exact; estimate tracks large sets within 30%") {
    val k = 64
    val small = (1 to 20).map(i => (i * 7919L) & ((1L << 60) - 1))
    val smallEst = small.toDF("h")
      .agg(round(Kmv.estimateDistinct(Kmv.sketch(col("h"), k), k), 4))
      .head().getDouble(0)
    assert(smallEst === 20.0)
    val n = 20000
    val bigDf = (1 to n).toDF("i")
      .select(graft.ops.Dedup.hash60(concat(lit("kmvspec:"),
        col("i").cast("string"))).as("h"))
    val est = bigDf.agg(Kmv.estimateDistinct(Kmv.sketch(col("h"), k), k))
      .head().getDouble(0)
    assert(math.abs(est - n) / n < 0.3, s"est=$est for n=$n")
  }
}
