package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: dump a SUBSET of SparkEntry.queries (comma-separated names
  * in args(2)) the same way Verify does, so tools/parity.py can check
  * just the queries under iteration without the full 67-query run.
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
    new java.io.File(outDir).mkdirs()
    val wanted = names.split(",").map(_.trim).filter(_.nonEmpty)
    val missing = wanted.filterNot(graft.SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(",")}")
    wanted.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[quick-verify] wrote $name")
    }
    // parity.py needs oracle_sql.json next to the dumps
    val sub = graft.SparkEntry.oracleSql.filter { case (k, _) => wanted.contains(k) }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c    => c.toString
    } + "\""
    val json = sub.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",\n", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
