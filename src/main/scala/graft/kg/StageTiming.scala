package graft.kg

import org.apache.spark.sql.SparkSession

object StageTiming {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("8")
    val nDocs = 60000L
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("dbg").toString
    DataGen.corpus(spark, nDocs, 64).toDF().write.parquet(s"$tmp/c")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMER $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$tmp/c")
    t("scan_count")(docs.count())
    val records = Extract.records(docs)
    t("extract_count")(records.count())
    val prepped = Link.prepWdSparql(DataGen.wdSparql(spark))
    val (idMap, idMapWd) = Link.idMaps(prepped)
    t("idMaps_count") { idMap.count(); idMapWd.count() }
    val taxa = t("stackTaxa") {
      val x = Link.stackTaxa(records, nDocs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    val initial = t("initialMatch") {
      val x = Link.initialMatch(taxa, idMap, idMapWd); x.count(); x
    }
    t("secondaryMatch") {
      Link.secondaryMatch(initial, Link.lineagePrep(DataGen.wdLineage(spark))).count()
    }
    val matched = t("matchTaxa")(Link.matchTaxa(records, DataGen.wdSparql(spark),
      DataGen.wdLineage(spark), nDocs))
    val (dictId, dictName) = t("wdMapDicts") {
      val d = Materialize.wdMapDicts(matched); d._1.count(); d._2.count(); d
    }
    val resolved = Materialize.resolve(records, dictId, dictName)
    t("resolve_count")(resolved.count())
    val mm = Extract.mediaMentions(records, DataGen.mediaMeta(spark))
    t("triples_count")(Materialize.globiTriples(resolved, Some(mm)).count())
    spark.stop()
  }
}
