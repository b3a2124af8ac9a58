package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The declarative HLL distinct-count sketch's load-bearing properties:
  * the estimate's accuracy across scales, duplicate-invariance (a sketch
  * of distinct values equals a sketch of the multiset), and the certified
  * columns p08 carries through the driver gate (merge_ok, within_bound). */
class HllSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def run(vals: Seq[Long], slices: Int = 4) =
    Profile.certifiedDistinct(vals.toDF("v"), col("v"), slices).head()

  test("estimate tracks the exact distinct count within the certified bound") {
    Seq(2000, 20000).foreach { n =>
      val r = run(1L to n.toLong)
      assert(r.getAs[Long]("n_exact") == n.toLong)
      assert(r.getAs[Int]("within_bound") == 1,
        s"n=$n est=${r.getAs[Long]("est_distinct")}")
      assert(r.getAs[Int]("merge_ok") == 1)
    }
  }

  test("sketch is duplicate-invariant: multiset and set estimates agree") {
    val base = (1L to 3000L)
    val dup = base ++ base ++ base.take(500)
    val a = run(base)
    val b = run(dup)
    Seq("est_distinct", "register_sum", "nonzero_registers").foreach { c =>
      assert(a.getAs[Long](c) == b.getAs[Long](c), c)
    }
    assert(b.getAs[Long]("n_exact") == 3000L)
  }

  test("merge certification holds for any slice count") {
    Seq(2, 7, 16).foreach { k =>
      val r = run(1L to 5000L, slices = k)
      assert(r.getAs[Int]("merge_ok") == 1, s"slices=$k")
    }
  }

  // Small-range regime (n comparable to m = 512): the raw estimator
  // overshoots by ~60% here; the shared formula's linear-counting arm must
  // keep the certified 15% bound. Regression-pins the Flajolet §4
  // correction — the cardinalities below all fail without it.
  test("small-range correction holds the bound where the raw estimator fails") {
    Seq(50, 350, 900).foreach { n =>
      val r = run(1L to n.toLong)
      assert(r.getAs[Int]("within_bound") == 1,
        s"n=$n est=${r.getAs[Long]("est_distinct")}")
    }
  }

  test("overlap inclusion-exclusion: disjoint ~ zero, identical ~ whole") {
    def est(a: Seq[Long], b: Seq[Long]) = Profile.overlapEstimates(
      a.toDF("v"), b.toDF("v"), col("v")).head()
    val disjoint = est(1L to 2000L, 10001L to 12000L)
    assert(disjoint.getAs[Long]("est_inter") * 4 <=
      disjoint.getAs[Long]("est_union"),
      s"disjoint est_inter=${disjoint.getAs[Long]("est_inter")}")
    val same = est(1L to 2000L, 1L to 2000L)
    // identical corpora: union sketch == each side's sketch, so
    // inclusion-exclusion is EXACTLY the single-corpus estimate
    assert(same.getAs[Long]("est_inter") == same.getAs[Long]("est_a"))
    assert(same.getAs[Long]("est_union") == same.getAs[Long]("est_a"))
  }
}
