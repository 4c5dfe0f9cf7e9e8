package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: print the EXECUTED plan (post-AQE) of named SparkEntry
  * queries with an exchange/broadcast summary — the `.explain` audit
  * the build discipline asks for per operator, runnable without
  * writing a scratch main each time.
  * Usage: runMain graft.tools.PlanProbe <sfDir> <q1,q2,...>
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      // finalize AQE so the printed plan is the real one: execute THIS
      // DataFrame's own QueryExecution (a noop write would run a
      // separate QueryExecution, leaving df's executedPlan pre-AQE —
      // AdaptiveSparkPlan isFinalPlan=false — and the exchange/join
      // counts would lie). toRdd.foreach discards rows executor-side,
      // so a row-per-event query never materializes on the driver.
      df.queryExecution.toRdd.foreach(_ => ())
      val p = df.queryExecution.executedPlan.toString
      val lines = p.linesIterator.toSeq
      println(s"==== $q ====")
      println(s"  shuffle exchanges: " +
        lines.count(l => l.contains("Exchange hashpartitioning") ||
          l.contains("Exchange rangepartitioning")))
      println(s"  broadcast exchanges: " +
        lines.count(_.contains("BroadcastExchange")))
      println(s"  joins: " + lines.count(_.contains("Join")))
      lines.filter(l => l.contains("Exchange") || l.contains("Join"))
        .foreach(l => println("  | " + l.trim.take(120)))
    }
    spark.stop()
  }
}
