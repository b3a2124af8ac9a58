package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must survive a zero-row corpus.
  *
  * The empty corpus is not a degenerate test case — it is the
  * day-2-with-no-new-data shape every incremental pipeline eventually
  * feeds the engine, and at cluster scale it is what any filtered
  * partition/tenant/date-slice looks like. Round 7 found five operators
  * that threw on it, all driver-side scalar reads or schema inference:
  * d13's self-join sizing statistics (`sum` over empty is NULL →
  * `getLong` threw), g06/g13's rank initialization (`SCALE / 0`), and
  * q39/q54's read-back of a zero-file partitioned write (nothing to
  * infer a schema from). This spec keeps all 156 honest at once.
  */
class EmptyInputSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private lazy val emptyDir: String = {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_empty_input_sf").toString
    Tables.all.foreach { t =>
      Tables.load(spark, "/root/testdata/sf0.001", t).limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("all registered queries run on an empty corpus without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch {
          case e: Throwable => Some(
            s"$name: ${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).take(160))
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries throw on empty input:\n  " +
        failures.mkString("\n  "))
  }
}
