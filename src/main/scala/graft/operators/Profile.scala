package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column profiling for data-quality gates: one pass over the table
  * producing per-column null counts, distinct counts, and min/max.
  *
  * All per-column statistics are computed in a single aggregate (one scan,
  * one reduce) and then unpivoted driver-free via an explode over a
  * literal array — no per-column jobs, no collect. At 100 TB swap the
  * exact `count(DISTINCT)` for `approx_count_distinct` (the exact form is
  * kept here because it is oracle-checkable).
  */
object Profile {

  /** Long-format profile: (column, n_nulls, n_distinct, min_val, max_val).
    * Doubles are rounded to 2dp before string rendering (engine-portable). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    def render(c: String) = df.schema(c).dataType.typeName match {
      case "double" | "float" => (x: org.apache.spark.sql.Column) => round(x, 2).cast("string")
      case _ => (x: org.apache.spark.sql.Column) => x.cast("string")
    }
    val aggs = cols.flatMap { c =>
      val r = render(c)
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$c"),
        countDistinct(col(c)).as(s"_distinct_$c"),
        r(min(col(c))).as(s"_min_$c"),
        r(max(col(c))).as(s"_max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.map(c => struct(
      lit(c).as("column"),
      col(s"_nulls_$c").as("n_nulls"),
      col(s"_distinct_$c").as("n_distinct"),
      col(s"_min_$c").as("min_val"),
      col(s"_max_$c").as("max_val"))): _*)
    wide.select(explode(entries).as("p")).select(col("p.*"))
  }

  val queries: Seq[Q] = Seq(
    Q("p01_profile",
      (s, dir) => profile(Tables.load(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
        .orderBy(col("column")), {
        def one(c: String, rendered: String) =
          s"""SELECT '$c' AS "column",
             |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
             |  count(DISTINCT $c) AS n_distinct,
             |  CAST($rendered AS VARCHAR) AS min_val,
             |  CAST(${rendered.replace("min(", "max(")} AS VARCHAR) AS max_val
             |FROM customer""".stripMargin
        Some(Seq(
          one("c_custkey", "min(c_custkey)"),
          one("c_name", "min(c_name)"),
          one("c_nationkey", "min(c_nationkey)"),
          one("c_acctbal", "round(min(c_acctbal), 2)"),
          one("c_mktsegment", "min(c_mktsegment)"),
        ).mkString("", "\nUNION ALL\n", "\nORDER BY \"column\""))
      }),
  )
}
