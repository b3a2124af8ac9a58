package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every module's query list. Each query name maps to a Spark
  * builder `(session, sfDir) => DataFrame`; `oracleSql` carries the DuckDB
  * equivalent for the driver's correctness gate.
  */
object SparkEntry {

  private def allQ: Seq[Q] =
    operators.Relational.queries ++
      operators.GraphOps.queries ++
      operators.TextOps.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.Profile.queries ++
      operators.Pipeline.queries ++
      streaming.EventStreams.queries ++
      sources.Formats.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    queries("q01_agg")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Q.toQueries(allQ)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Q.toOracle(allQ)
}
