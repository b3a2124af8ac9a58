package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark-native builder plus (when SQL-expressible) the
  * ANSI-SQL oracle text the driver runs in DuckDB over the same parquet
  * tables. Column names/aliases MUST match between `build` output and `sql`
  * (the correctness gate sorts columns by name before hashing).
  *
  * Conventions that keep the DuckDB hash-compare deterministic:
  *   - every computed column is aliased identically on both sides;
  *   - double aggregates are rounded (money → 2 dp, ratios/avgs → 4 dp) so
  *     summation-order float noise can't flip a hash;
  *   - every query ends with a total ORDER BY on its key columns;
  *   - timestamps in output are formatted to strings or cast to dates.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    sql: Option[String] = None,
    doc: String = "")

object Q {
  /** Assemble Seq[Q] into the SparkEntry maps. */
  def toQueries(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.build).toMap
  def toOracle(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.sql.map(q.name -> _)).toMap
}
