package graft.kg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage scaling probe: times extract / link / emit / dedup
  * separately at two core counts on one pre-materialized corpus.
  * Usage: runMain graft.kg.StageScaling [nDocs] [coresCsv]
  */
object StageScaling {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val coreList = args.drop(1).headOption.getOrElse("2,8")
      .split(",").map(_.toInt).toSeq
    val tmp = java.nio.file.Files.createTempDirectory("ss").toString

    { // prep
      val s = graft.ScalingBench.session(32)
      DataGen.corpus(s, nDocs, 64).toDF().write.parquet(s"$tmp/c")
      s.stop()
    }

    coreList.foreach { cores =>
      val spark = graft.ScalingBench.session(cores)
      spark.sparkContext.setLogLevel("ERROR")
      def t(name: String)(f: => Any): Unit = {
        val t0 = System.nanoTime(); f
        println(f"STAGE cores=$cores $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val docs = spark.read.parquet(s"$tmp/c")
      val records = Extract.records(docs)
      // warmup small
      graft.ScalingBench.pipelineCount(spark,
        DataGen.corpus(spark, 2000, cores).toDF(), 2000)
      t("extract")(records.count())
      var matched: org.apache.spark.sql.DataFrame = null
      t("link") {
        matched = Link.matchTaxa(records, DataGen.wdSparql(spark),
          DataGen.wdLineage(spark), nDocs)
      }
      val (dictId, dictName) = Materialize.wdMapDicts(matched)
      t("dicts") { dictId.count(); dictName.count() }
      val mm = Extract.mediaMentions(records, DataGen.mediaMeta(spark))
      // emission without final dedup
      val vocabBc = spark.sparkContext.broadcast(Materialize.termVocab())
      t("emit_only") {
        import spark.implicits._
        val idm = dictId.collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
        val nmm = dictName.collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
        val bcId = spark.sparkContext.broadcast(idm)
        val bcName = spark.sparkContext.broadcast(nmm)
        val cols = Seq("doc_id", "recNum",
          "sourceTaxonId", "sourceTaxonName", "targetTaxonId", "targetTaxonName",
          "interactionTypeName", "interactionTypeId", "localityName",
          "referenceDoi", "sourceDOI", "decimalLatitude", "decimalLongitude",
          "sourceBodyPartName", "sourceBodyPartId", "sourceLifeStageName",
          "sourceLifeStageId", "targetBodyPartName", "targetBodyPartId",
          "targetLifeStageName", "targetLifeStageId", "sourceSexName",
          "targetSexName")
        records.select(cols.map(col): _*).flatMap { r =>
          def s(i: Int) = r.getString(i)
          def res(id: String, name: String) =
            bcId.value.get(id).orElse(bcName.value.get(name)).map { case (wd, mv) =>
              (wd, if (name != null && name.nonEmpty) name else mv)
            }
          (res(s(2), s(3)), res(s(4), s(5))) match {
            case (Some((sWd, sName)), Some((tWd, tName))) if sWd != tWd =>
              Materialize.emit(Materialize.ResolvedRecord(s(0), r.getLong(1),
                sWd, sName, tWd, tName, s(6), s(7), s(8), s(9), s(10), s(11),
                s(12), s(13), s(14), s(15), s(16), s(17), s(18), s(19), s(20),
                s(21), s(22)), vocabBc.value)
            case _ => Nil
          }
        }.count()
      }
      t("full_with_dedup") {
        Materialize.globiTriplesFused(records, dictId, dictName, Some(mm)).count()
      }
      spark.stop()
    }
  }
}
