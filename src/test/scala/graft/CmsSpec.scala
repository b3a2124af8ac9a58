package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The count-min frequency sketch's load-bearing properties: the
  * deterministic overestimate guarantee (est ≥ exact, always — the
  * structural invariant p09 certifies), exactness when the key universe
  * fits the grid without collisions, and slice-merge invariance for any
  * slice count (the persist-and-fold property of the sum monoid). */
class CmsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def run(vals: Seq[Long], depth: Int = 4, width: Int = 64,
      probes: Int = 10, slices: Int = 4) =
    Profile.certifiedFreq(vals.toDF("v"), col("v"), depth, width, probes, slices)
      .collect().map(r => r.getAs[Long]("pk") -> r).toMap

  test("never undercounts, and probe estimates cover exact frequencies") {
    // skewed multiset over 200 keys on a 64-wide grid: collisions certain
    val vals = (0L until 200L).flatMap(k => Seq.fill((k % 7 + 1).toInt)(k))
    val rows = run(vals)
    assert(rows.size == 10)
    rows.foreach { case (pk, r) =>
      val exact = pk % 7 + 1
      assert(r.getAs[Long]("n_exact") == exact, s"pk=$pk")
      assert(r.getAs[Int]("over_ok") == 1, s"pk=$pk under-counted")
      assert(r.getAs[Long]("est") >= exact)
      assert(r.getAs[Int]("merge_ok") == 1)
    }
  }

  test("collision-free grid gives exact counts") {
    // 8 distinct keys into a 1024-wide grid: P(any collision) tiny, and
    // deterministic for the fixed hash family — est == exact for all
    val vals = (0L until 8L).flatMap(k => Seq.fill((k + 1).toInt)(k))
    val rows = run(vals, width = 1024, probes = 8)
    rows.foreach { case (pk, r) =>
      assert(r.getAs[Long]("est") == r.getAs[Long]("n_exact"), s"pk=$pk")
    }
  }

  test("probe keys absent from the corpus report n_exact = 0, est >= 0") {
    val rows = run(Seq(100L, 101L, 102L))
    rows.foreach { case (_, r) =>
      assert(r.getAs[Long]("n_exact") == 0L)
      assert(r.getAs[Int]("over_ok") == 1)
    }
  }

  test("merge certification holds for any slice count") {
    val vals = (0L until 500L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
    Seq(2, 7, 16).foreach { k =>
      val rows = run(vals, slices = k)
      rows.foreach { case (pk, r) =>
        assert(r.getAs[Int]("merge_ok") == 1, s"slices=$k pk=$pk")
      }
    }
  }
}
