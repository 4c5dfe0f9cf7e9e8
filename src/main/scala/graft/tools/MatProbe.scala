package graft.tools
import org.apache.spark.sql.SparkSession
object MatProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[matprobe] $name ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    t("warmup")(graft.SparkEntry.queries("q1_agg")(spark, dir).count())
    t("globiTable")(graft.queries.Materialized.globiTable(spark, dir))
    t("trydbTable")(graft.queries.Materialized.trydbTable(spark, dir))
    t("lshPairs")(graft.queries.PipelineQueries.materializeShared(spark, dir))
    t("orgEdges")(graft.queries.CaseStudyQueries.materializeShared(spark, dir))
    t("incState")(graft.queries.PipelineQueries.materializeIncrementalState(spark, dir))
    spark.stop()
  }
}
