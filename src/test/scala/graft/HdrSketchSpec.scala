package graft

import graft.functions.HdrSketch
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The HDR quantile sketch's three load-bearing properties: bucket
  * monotonicity, the integer-exact midpoint error bound, and exact merge
  * invariance under arbitrary slicings (the property p07's merge_ok column
  * certifies through the driver gate). */
class HdrSketchSpec extends AnyFunSuite {

  private val rnd = new Random(11)
  private def samples: Seq[Long] =
    (1 to 2000).map(_ => 1L + (math.abs(rnd.nextLong()) % 10000000L)) ++
      Seq(1L, 2L, 63L, 64L, 65L, 127L, 128L, Long.MaxValue)

  test("bucketOf is monotone non-decreasing and estOf lands in-bucket") {
    val vs = samples.sorted
    vs.sliding(2).foreach { case Seq(a, b) =>
      assert(HdrSketch.bucketOf(a) <= HdrSketch.bucketOf(b),
        s"bucket order inverted at $a -> $b")
    }
    vs.foreach { v =>
      val est = HdrSketch.estOf(HdrSketch.bucketOf(v))
      // the certified integer bound: 2^(SubBits+1) · |est − v| ≤ v
      assert(BigInt(2 * HdrSketch.SubBuckets) * BigInt((est - v).abs) <= BigInt(v),
        s"relative bound violated at v=$v est=$est")
    }
  }

  test("buckets stay inside the dense buffer for any positive long") {
    Seq(1L, 63L, 64L, 4095L, Long.MaxValue / 2, Long.MaxValue).foreach { v =>
      val b = HdrSketch.bucketOf(v)
      assert(b >= 0 && b < HdrSketch.MaxBuckets, s"bucket $b out of range at $v")
    }
    // zero is a VALUE, not an error: real corpora hold zero-length rows
    // (fuzz gate finding) — it lands in bucket 0 with an exact midpoint
    assert(HdrSketch.bucketOf(0L) === 0)
    assert(HdrSketch.estOf(0) === 0L)
    assert(intercept[IllegalArgumentException](HdrSketch.bucketOf(-1L))
      .getMessage.contains(">= 0"))
  }

  test("merged per-slice sketches equal the whole-stream sketch exactly") {
    val vs = samples
    val whole = vs.foldLeft(HdrSketch.agg.zero)(HdrSketch.agg.reduce)
    (2 to 5).foreach { k =>
      val slices = vs.groupBy(v => math.abs(v.hashCode) % k).values
      val merged = slices
        .map(s => s.foldLeft(HdrSketch.agg.zero)(HdrSketch.agg.reduce))
        .reduce(HdrSketch.agg.merge)
      assert(java.util.Arrays.equals(merged, whole),
        s"merge of $k slices diverged from the one-pass sketch")
    }
    // and the sparse rendering is bucket-ascending with no zero counts
    val fin = HdrSketch.agg.finish(whole)
    assert(fin.map(_._1).toSeq == fin.map(_._1).sorted.toSeq)
    assert(fin.forall(_._2 > 0))
    assert(fin.map(_._2).sum == vs.size)
  }
}
