package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{RelationalQueries, PipelineQueries, KgQueries,
  SparqlQueries, PipelineOracles, CaseStudyQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query naming carries SURVEY.md §2 operator ids (prefixes s, p, j, a,
  * w, u, f = scans, predicates, joins, aggregations, windows, set-ops,
  * functions from the reference inventory; tx, dd, sim, ev = training-data
  * pipeline operators; kg = the knowledge-graph construction pipeline).
  */
object SparkEntry {
  /** Flagship: the full KG construction pipeline (extract → link →
    * materialize) on the smallest corpus; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    KgQueries.queries("kg_pipeline_triples")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ PipelineQueries.queries ++
      KgQueries.queries ++ SparqlQueries.queries ++ CaseStudyQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (+ the side-channel dumps Materialized
    * writes). Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ PipelineQueries.oracle ++ KgQueries.oracle ++
      SparqlQueries.oracle ++ PipelineOracles.oracle ++ CaseStudyQueries.oracle
}
