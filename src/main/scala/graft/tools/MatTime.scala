package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: time the once-per-scale materialization components
  * separately (Bench reports them as one `materialize_tables` line).
  */
object MatTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shm = new java.io.File("/dev/shm")
    val localDir = if (shm.isDirectory && shm.canWrite)
      "/dev/shm/graft-spark" else System.getProperty("java.io.tmpdir")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mattime] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("warmup")(graft.SparkEntry.queries("q1_agg")(spark, sfDir).count())
    time("globiTable")(graft.queries.Materialized.globiTable(spark, sfDir))
    time("trydbTable")(graft.queries.Materialized.trydbTable(spark, sfDir))
    time("lshPairs")(graft.queries.PipelineQueries.materializeShared(spark, sfDir))
    spark.stop()
  }
}
