package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** Scratch profiler for the dd_shingle_lsh stages (dev only). */
object TimeShingle {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ts] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    // stage 1: arrays via transform-hash (new formulation)
    val arrays = time("arrays_checkpoint") {
      d.select(col("doc_id").as("id"),
          TextOps.tokens(TextOps.normalizeText(col("text"))).as("_ts"))
        .select(col("id"), sort_array(array_distinct(
          graft.functions.Hash60Array(spark,
            Dedup.shinglesOf(col("_ts"), 3)))).as("toks"))
        .localCheckpoint(true)
        .filter(size(col("toks")) > 0)
        .withColumn("n_tok", size(col("toks")).cast("long"))
    }
    val sigs = Dedup.minhashSignaturesFromArrays(arrays, 4)
    time("sigs_count")(sigs.write.format("noop").mode("overwrite").save())
    val cands = time("cands") {
      val c = Dedup.lshCandidates(Dedup.lshBands(sigs, 4, 2), maxBucket = 1000)
        .localCheckpoint(true)
      println("  n_cands=" + c.count()); c
    }
    time("verify") {
      Dedup.jaccardVerifyArrays(cands, arrays)
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"))
        .write.format("noop").mode("overwrite").save()
    }
    // old formulation for comparison
    val tokens = time("old_tokens_distinct") {
      val t = d.select(col("doc_id").as("id"),
          TextOps.tokens(TextOps.normalizeText(col("text"))).as("_ts"))
        .select(col("id"), explode(Dedup.shinglesOf(col("_ts"), 3)).as("sh"))
        .select(col("id"), Dedup.hash60(col("sh")).as("token"))
        .distinct()
      t.write.format("noop").mode("overwrite").save(); t
    }
    val sigsOld = Dedup.minhashSignatures(tokens, 4)
    time("old_sigs")(sigsOld.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
