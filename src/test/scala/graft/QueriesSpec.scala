package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + SQL-parity checks for every registered query.
  *
  * Full DuckDB-oracle validation runs via tools/check_oracle.py (mimicking
  * the driver's gate); here each query must (a) run on sf0.001, (b) return
  * rows, and (c) where the oracle SQL is Spark-parsable, match Spark's own
  * execution of that SQL — catching DataFrame-vs-SQL drift early.
  */
class QueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  // Oracle SQL that Spark parses but executes with DIFFERENT semantics:
  // g08 uses DuckDB printf('%b') (binary formatting) — Spark's printf is
  // java.util.Formatter, where %b means boolean. The cross-engine check
  // for g08 is the DuckDB gate itself.
  private val sqlSkip = Set("g08_degree_histogram")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows") {
      val df = fn(spark, dir)
      assert(df.count() > 0, s"$name returned no rows at sf0.001")
    }
  }

  test("oracle SQL matches DataFrame results under Spark SQL where parsable") {
    Tables.registerAll(spark, dir)
    var checked = 0
    for ((name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1) if !sqlSkip(name)) {
      val viaSql =
        try Some(spark.sql(sql))
        catch { case _: Throwable => None } // DuckDB-only dialect: skip
      viaSql.foreach { sdf =>
        val api = SparkEntry.queries(name)(spark, dir)
        val a = api.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        val b = sdf.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        assert(a.length == b.length, s"$name: row count API=${a.length} SQL=${b.length}")
        assert(a.zip(b).forall { case (x, y) => x == y }, s"$name: value mismatch")
        checked += 1
      }
    }
    assert(checked > 0, "no oracle SQL was Spark-parsable — parity check vacuous")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
