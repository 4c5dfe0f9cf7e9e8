package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the incremental-dedup driver row (dev only). */
object TimeInc {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stateDir = java.nio.file.Files.createTempDirectory("ti").toString
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val cfg = graft.ops.IncrementalDedup.LshConfig(4, 2, 0.8, 1, 1000)
    (0 until 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.ops.IncrementalDedup.update(spark, stateDir,
        d.filter(col("doc_id") % 3 === i), "doc_id", "text", s"i$i", cfg).count()
      println(f"increment $i: ${(System.nanoTime()-t0)/1e9}%.1f s, $n pairs")
    }
    val t1 = System.nanoTime()
    println("log rows: " + graft.ops.IncrementalDedup
      .pairsFromTable(spark, stateDir).count())
    println(f"read log: ${(System.nanoTime()-t1)/1e9}%.1f s")
    spark.stop()
  }
}
