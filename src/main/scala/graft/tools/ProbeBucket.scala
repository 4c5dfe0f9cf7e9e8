package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: does a hive-partitioned AND bucketed table keep
  * exchange-free sort-merge self-joins on the bucket key, and does
  * partition pruning fire for pred filters? (round-6 attribution)
  */
object ProbeBucket {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = spark.range(0, 100000)
      .select(concat(lit("s"), (col("id") % 9973)).as("subj"),
        concat(lit("p"), (col("id") % 7)).as("pred"),
        concat(lit("o"), col("id")).as("obj"))
    spark.sql("DROP TABLE IF EXISTS pb_t")
    df.write.partitionBy("pred").bucketBy(16, "subj").sortBy("subj")
      .mode("overwrite").format("parquet").saveAsTable("pb_t")
    val t = spark.table("pb_t")
    val a = t.filter(col("pred") === "p1").select(col("subj"), col("obj").as("o1"))
    val b = t.filter(col("pred") === "p2").select(col("subj"), col("obj").as("o2"))
    val j = a.join(b, Seq("subj"))
    j.write.format("noop").mode("overwrite").save()
    val plan = j.queryExecution.executedPlan.toString
    println("HAS_EXCHANGE=" + plan.contains("Exchange"))
    println("PARTFILTERS=" + plan.linesIterator.filter(_.contains("PartitionFilters")).take(2).mkString(" | ").take(300))
    println(j.queryExecution.executedPlan.treeString.linesIterator.take(25).mkString("\n"))
    spark.stop()
  }
}
