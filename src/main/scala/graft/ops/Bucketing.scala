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

  /** Write df as a bucketed (and sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket key — with matching
    * bucket counts Catalyst plans a SortMergeJoin with NO Exchange on
    * either side.
    */
  def joinBucketed(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
