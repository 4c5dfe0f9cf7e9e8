package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SHACL-lite shapes validation over a (subj, pred, obj[, objIsLiteral,
  * objDatatype]) triple table — the constraint checks a KG-construction
  * pipeline runs before publishing a graph (sh:minCount / sh:maxCount /
  * sh:nodeKind sh:IRI / sh:datatype).
  *
  * Scale shape: ALL cardinality shapes evaluate from ONE pred-pushed
  * scan + ONE per-subject conditional aggregate (the type tag and every
  * constrained path's count ride the same shuffle), then each shape is
  * a filter over that node-scale frame assembled by a bounded explode —
  * never one scan per shape. NodeKind/datatype shapes are pure scan
  * filters (no shuffle at all).
  */
object Shacl {

  /** targetClass instances must have minCount ≤ |path| ≤ maxCount. */
  final case class CardShape(id: String, targetClass: String, path: String,
      minCount: Long = 0L, maxCount: Long = Long.MaxValue)

  /** Objects of `path` must be IRIs (objIsLiteral = false). */
  final case class IriShape(id: String, path: String)

  /** Objects of `path` must be literals of `datatype`. */
  final case class DatatypeShape(id: String, path: String, datatype: String)

  /** Objects of `path` must be instances of `cls` (sh:class — the
    * range constraint): violation when the object node carries no
    * `rdf:type cls` triple. One anti-join of the path's objects
    * against the cls-typed subject set (type sets are
    * class-cardinality-bounded, so the join's build side is the typed
    * ids, not the corpus).
    */
  final case class ClassShape(id: String, path: String, cls: String)

  private val rdfType = graft.kg.Model.RDF_TYPE

  /** Long-format violations: one (shape_id, subj) row per violation. */
  def violations(triples: DataFrame, card: Seq[CardShape],
      iri: Seq[IriShape] = Nil, dt: Seq[DatatypeShape] = Nil,
      cls: Seq[ClassShape] = Nil): DataFrame = {
    require(card.nonEmpty || iri.nonEmpty || dt.nonEmpty || cls.nonEmpty,
      "no shapes")
    val parts = cardViolations(triples, card) ++
      iri.map(sh => triples
        .filter(col("pred") === sh.path && col("objIsLiteral"))
        .select(lit(sh.id).as("shape_id"), col("subj"))) ++
      dt.map(sh => triples
        .filter(col("pred") === sh.path &&
          (!col("objIsLiteral") || col("objDatatype") =!= sh.datatype))
        .select(lit(sh.id).as("shape_id"), col("subj"))) ++
      cls.map { sh =>
        val typed = triples.filter(col("pred") === rdfType &&
          col("obj") === sh.cls).select(col("subj").as("obj"))
        triples.filter(col("pred") === sh.path)
          .select(col("subj"), col("obj"))
          .join(typed, Seq("obj"), "left_anti")
          .select(lit(sh.id).as("shape_id"), col("subj"))
      }
    parts.reduce(_ union _)
  }

  private def cardViolations(triples: DataFrame,
      card: Seq[CardShape]): Seq[DataFrame] = {
    if (card.isEmpty) return Nil
    val targets = card.map(_.targetClass).distinct
    val paths = card.map(_.path).distinct
    val cnt = paths.zipWithIndex.map { case (p, i) => p -> s"c_$i" }.toMap
    val perSubj = triples.filter(col("pred").isin(rdfType +: paths: _*))
      .groupBy(col("subj"))
      .agg(
        max(when(col("pred") === rdfType && col("obj").isin(targets: _*),
          col("obj"))).as("ttype"),
        paths.map(p =>
          sum(when(col("pred") === p, 1L).otherwise(0L)).as(cnt(p))): _*)
    val checks: Column = array(card.map { sh =>
      struct(lit(sh.id).as("shape_id"),
        (col("ttype") === sh.targetClass &&
          (col(cnt(sh.path)) < sh.minCount ||
            col(cnt(sh.path)) > sh.maxCount)).as("bad"))
    }: _*)
    Seq(perSubj.select(col("subj"), explode(checks).as("chk"))
      .filter(col("chk.bad"))
      .select(col("chk.shape_id").as("shape_id"), col("subj")))
  }

  /** Constant-size validation report: per shape, the violation COUNT
    * plus an order-independent bit_xor fingerprint of the violating
    * subjects — pins the exact violating SET at any scale without
    * shipping it. Shapes with zero violations appear with (0, 0).
    */
  def report(triples: DataFrame, card: Seq[CardShape],
      iri: Seq[IriShape] = Nil, dt: Seq[DatatypeShape] = Nil,
      cls: Seq[ClassShape] = Nil): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val agg = violations(triples, card, iri, dt, cls)
      .select(col("shape_id"), Dedup.hash60(col("subj")).as("h"))
      .groupBy(col("shape_id"))
      .agg(count(lit(1)).as("n_violations"), expr("bit_xor(h)").as("fp"))
    val all = (card.map(_.id) ++ iri.map(_.id) ++ dt.map(_.id) ++
      cls.map(_.id)).toDF("shape_id")
    broadcast(all).join(agg, Seq("shape_id"), "left")
      .select(col("shape_id"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        coalesce(col("fp"), lit(0L)).as("fp"))
      .orderBy(col("shape_id"))
  }
}
