package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("asofJoin picks latest at-or-before right row per key") {
    val left = Seq((1L, 100L, "p1"), (1L, 250L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 90L, 9.0), (1L, 200L, 2.0), (1L, 300L, 3.0), (3L, 10L, 1.0))
      .toDF("k", "ts", "v")
    val res = AsOf.asofJoin(left, right, "k", "ts")
      .select($"name", $"matched.ts".as("mts"), $"matched.v".as("mv"))
      .collect().map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(res("p1") === ((Some(90L), Some(9.0))))   // 90 <= 100, not 200
    assert(res("p2") === ((Some(200L), Some(2.0))))  // 200 <= 250, not 300
    assert(res("p3") === ((None, None)))             // key 2 has no rights
  }

  test("asofJoin includes right rows at exactly-equal ts") {
    val left = Seq((1L, 100L, "p")).toDF("k", "ts", "name")
    val right = Seq((1L, 100L, 7.0)).toDF("k", "ts", "v")
    val res = AsOf.asofJoin(left, right, "k", "ts")
      .select($"matched.v").collect().head.getDouble(0)
    assert(res === 7.0)
  }

  test("asofJoin forward picks earliest at-or-after; tolerance nulls distant matches") {
    val left = Seq((1L, 100L, "a"), (1L, 260L, "b"), (2L, 10L, "c"))
      .toDF("k", "ms", "name")
      .select($"k", timestamp_millis($"ms").as("ts"), $"name")
    val right = Seq((1L, 120L, 1.0), (1L, 500L, 5.0))
      .toDF("k", "ms", "v")
      .select($"k", timestamp_millis($"ms").as("ts"), $"v")
    val res = AsOf.asofJoin(left, right, "k", "ts",
        direction = "forward", toleranceMs = Some(100L))
      .select($"name", $"matched.v")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(res("a") === Some(1.0))  // 120 >= 100, gap 20 <= 100
    assert(res("b") === None)       // nearest following is 500: gap 240 > 100
    assert(res("c") === None)       // key 2 has no rights
    // without tolerance, b matches 500 (earliest at-or-after)
    val loose = AsOf.asofJoin(left, right, "k", "ts", direction = "forward")
      .select($"name", $"matched.v")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(loose("b") === Some(5.0))
  }

  test("approx_count_distinct within 5% of exact on lineitem") {
    // q25 now emits (l_returnflag, exact_orders, within_tol): the derived
    // invariant column IS the 5% assertion, checked per-group
    val rows = SparkEntry.queries("q25_approx_distinct")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)}: exact_orders not positive")
      assert(r.getInt(2) === 1, s"${r.getString(0)}: approx outside 5% of exact")
    }
  }
}
