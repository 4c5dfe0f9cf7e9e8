package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: dump a SUBSET of SparkEntry.queries (comma-separated names
  * in args(2)) via [[graft.Verify.dump]] — the same loop and JSON
  * escaper the driver path uses — so tools/parity.py can check just
  * the queries under iteration without the full Verify run.
  * Usage: runMain graft.tools.QuickVerify <sfDir> <outDir> <q1,q2,...>
  */
object QuickVerify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wanted = names.split(",").map(_.trim).filter(_.nonEmpty).toSet
    val missing = wanted.filterNot(graft.SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(",")}")
    val failed = graft.Verify.dump(spark, sfDir, outDir, wanted)
    (wanted -- failed).foreach(n => println(s"[quick-verify] wrote $n"))
    spark.stop()
    // unlike the driver's all-queries dump, the dev loop must be LOUD
    // on failure — a swallowed exception plus a stale parquet dir from
    // an earlier run would let parity report OK for code that never ran
    require(failed.isEmpty,
      s"[quick-verify] FAILED: ${failed.mkString(",")}")
  }
}
