package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile sketch over positive integers — an HDR-histogram
  * (Tene's HdrHistogram / log-linear bucketing, the same family as
  * DDSketch, Masson et al. VLDB'19) as a typed mergeable aggregate: the
  * quantile companion to [[MinHashAggregator]].
  *
  * Each value lands in a bucket addressed by its bit length and the next
  * [[HdrSketch.SubBits]] bits below the leading bit: values below
  * 2·SubBuckets are their own bucket (exact), larger magnitudes get
  * SubBuckets buckets per octave. The bucket midpoint reconstructs any
  * member value within relative error 2^-(SubBits+1) — with SubBits = 5,
  * 1/64 ≈ 1.6%, and the bound is an INTEGER inequality
  * (64·|est − v| ≤ v), so certifying queries can check it exactly in any
  * engine.
  *
  * Why this shape instead of a KLL/GK compactor: bucket counts form a
  * commutative monoid, so the sketch is ORDER- and SLICING-INVARIANT —
  * merged per-slice sketches equal the whole-corpus sketch bucket-for-
  * bucket, bit-for-bit, not merely within error. That exact-merge
  * property is what an incremental 100 TB pipeline persists (per-day
  * partials folded without re-reading old data), and what lets the
  * driver's hash-match gate machine-check the merge (the d11 pattern).
  * A KLL's randomized compaction gives a smaller sketch for the same
  * rank error but merge results depend on merge order — unverifiable by
  * exact comparison. The price is a value-range-bounded size: bucket
  * index < 59·SubBuckets for any positive long, a ~15 KB dense buffer.
  *
  * Everything is integer arithmetic — bit length, shifts, midpoints — so
  * an oracle SQL engine reproduces the sketch exactly (no cross-engine
  * `ln`/`ceil` ulp hazards, the reason the bucket function is NOT the
  * DDSketch `⌈log_γ x⌉`).
  */
object HdrSketch {

  /** Sub-octave resolution bits: 2^5 = 32 buckets per octave. */
  val SubBits: Int = 5
  val SubBuckets: Int = 1 << SubBits

  /** Dense buffer size: shift ≤ 63 − SubBits − 1, bucket < (shift+2)·2^SubBits. */
  val MaxBuckets: Int = (64 - SubBits) * SubBuckets

  /** Bucket index of a value ≥ 0 (monotone non-decreasing in v). Zero
    * lands in bucket 0 with an exact midpoint of 0 — real corpora
    * contain zero-length documents, and a sketch that rejects them
    * crashes the whole pipeline on one empty row (found by
    * tools/fuzz_oracle.py). */
  def bucketOf(v: Long): Int = {
    require(v >= 0, s"HdrSketch values must be >= 0, got $v")
    val m = 63 - java.lang.Long.numberOfLeadingZeros(v)
    if (m <= SubBits) v.toInt
    else {
      val shift = m - SubBits
      (shift << SubBits) + (v >> shift).toInt
    }
  }

  /** Midpoint estimate of a bucket: exact below 2·SubBuckets, else the
    * middle of the bucket's `2^shift`-wide value range. */
  def estOf(bucket: Int): Long =
    if (bucket < 2 * SubBuckets) bucket.toLong
    else {
      val shift = bucket / SubBuckets - 1
      val q = (bucket - (shift << SubBits)).toLong // in [SubBuckets, 2·SubBuckets)
      (q << shift) + (1L << (shift - 1))
    }

  /** The mergeable aggregate: dense count vector, elementwise-add merge. */
  val agg: Aggregator[Long, Array[Long], Array[(Int, Long)]] =
    new Aggregator[Long, Array[Long], Array[(Int, Long)]] {
      def zero: Array[Long] = new Array[Long](MaxBuckets)
      def reduce(buf: Array[Long], v: Long): Array[Long] = {
        buf(bucketOf(v)) += 1L; buf
      }
      def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
        var i = 0
        while (i < MaxBuckets) { x(i) += y(i); i += 1 }
        x
      }
      // sparse, bucket-ascending output — deterministic rendering
      def finish(buf: Array[Long]): Array[(Int, Long)] = {
        val out = Array.newBuilder[(Int, Long)]
        var i = 0
        while (i < MaxBuckets) { if (buf(i) != 0L) out += ((i, buf(i))); i += 1 }
        out.result()
      }
      def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      def outputEncoder: Encoder[Array[(Int, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Int, Long)]]()
    }

  /** Column form: `hdr_sketch(v)` → ARRAY<STRUCT<_1: bucket, _2: count>>. */
  def sketch(v: Column): Column = udaf(agg).apply(v)
}
