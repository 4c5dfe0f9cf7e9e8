package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins: pre-shuffle both sides once at write time
  * so every subsequent equi-join on the bucket key is exchange-free.
  *
  * The 100 TB use: the triple table bucketed by subj makes repeated
  * self-joins (the SPARQL-metrics workload — multiway subject joins)
  * shuffle-free, and the mention table bucketed by the link key joins
  * the dictionary partitions without moving the corpus.
  */
object Bucketing {

  /** Write df as a bucketed (and sorted) managed table, optionally
    * hive-partitioned by `partitionCols` first (the triple-store
    * vertical-partitioning layout: partition by pred, bucket by subj —
    * a pred-filtered pattern scan then reads ONLY its predicate's
    * files via partition pruning while subj joins stay exchange-free
    * on the bucketing; probed in ProbeBucket: partitioned+bucketed
    * scans keep `Bucketed: true` and SelectedBucketsCount). The input
    * is re-clustered by (partitionCols, bucket-id) so each task holds
    * whole (partition, bucket) groups — without it every write task
    * would emit a file per partition×bucket it touches and the file
    * count would multiply by the task count.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, partitionCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.{col, pmod, hash, lit}
    val clustered =
      if (partitionCols.isEmpty) df
      else df.repartition(
        (partitionCols.map(col) :+ pmod(hash(col(key)), lit(buckets))): _*)
    val w = clustered.write
    (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*))
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key — with matching
    * bucket counts Catalyst plans a SortMergeJoin with NO Exchange on
    * either side.
    */
  def joinBucketed(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
