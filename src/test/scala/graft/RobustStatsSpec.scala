package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The properties that make median/MAD the ROBUST estimator pair (p13):
  * translation equivariance, and insensitivity to a corrupt extreme row —
  * the failure mode that moves mean/stddev arbitrarily. */
class RobustStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def run(vals: Seq[Double]) = Profile.madOutliers(
    vals.map(("g", _)).toDF("g", "x"), "g", "x").head()

  test("median and MAD are translation-equivariant; outlier set is invariant") {
    val base = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0)
    val a = run(base)
    val b = run(base.map(_ + 50.0))
    assert(b.getAs[Long]("med_cents") == a.getAs[Long]("med_cents") + 5000L)
    assert(b.getAs[Long]("mad_cents") == a.getAs[Long]("mad_cents"))
    assert(b.getAs[Long]("n_outliers") == a.getAs[Long]("n_outliers"))
    assert(a.getAs[Long]("n_outliers") == 1L) // the planted 100.0
  }

  test("one corrupt extreme row cannot move the median or the MAD") {
    // odd-sized clean set: appending ONE extreme shifts the lower-median
    // rank into the same value-neighborhood, so med/MAD stay put while a
    // mean/stddev rule would blow up (mean jumps 4 -> ~1.25e8)
    val clean = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0)
    val a = run(clean)
    val b = run(clean :+ 1e9)
    assert(a.getAs[Long]("med_cents") == 400L)
    assert(b.getAs[Long]("med_cents") == 400L)
    assert(a.getAs[Long]("mad_cents") == b.getAs[Long]("mad_cents"))
    assert(b.getAs[Long]("n_outliers") == 1L) // exactly the corrupt row
  }
}
