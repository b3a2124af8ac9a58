package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable Bloom filter as a tiny DataFrame of bit words.
  *
  * A membership sketch for "is this key already in the reference set?" —
  * the dedup-pipeline primitive for filtering a corpus against an
  * already-ingested set without joining the full set. Spark's built-in
  * runtime Bloom (`bloom_filter_agg`) is not a public surface and its
  * bits are engine-private; this one is built from [[PortableHash]]'s
  * affine family over a 32-bit md5-derived base hash, so the EXACT filter
  * bits are reproducible in DuckDB SQL (or any engine) — integer
  * arithmetic end to end, no tolerance needed.
  *
  * Layout: `m` bit positions packed 63 per long (bit index ≤ 62 — DuckDB
  * range-checks `1::BIGINT << 63`, so the sign bit is left unused) keyed
  * by word index; at the default m=4096 the built filter is 66 rows,
  * broadcast to probes. `k` hash
  * positions reuse the first `k` MinHash coefficients. False-negative
  * rate is zero by construction (BloomSpec asserts it); false-positive
  * rate follows (1 - e^(-kn/m))^k.
  *
  * At 100 TB: build is one explode + one 64-group `bit_or` aggregation
  * (map-side combined to 64 rows per partition); probe is a broadcast
  * join that never shuffles the probed corpus. For reference sets where
  * n/m pushes the FP rate too high, raise `m` — the build shape is
  * unchanged.
  */
object PortableBloom {

  val DefaultM = 4096
  val DefaultK = 4

  private def positions(h: Column, m: Int, k: Int): Column =
    array((0 until k).map(j => PortableHash.minhash(h, j) % m): _*)

  private val bitOfPos: Column =
    expr("shiftleft(cast(1 as bigint), cast(pos % 63 as int))")

  /** Build the filter over `keyCol` of `keys`: returns (word BIGINT,
    * bits BIGINT), at most m/64 rows. */
  def build(keys: DataFrame, keyCol: Column, m: Int = DefaultM, k: Int = DefaultK): DataFrame =
    keys.select(PortableHash.baseHash(keyCol).as("h"))
      .select(explode(positions(col("h"), m, k)).as("pos"))
      .select(expr("pos div 63").as("word"), bitOfPos.as("bit"))
      .groupBy(col("word")).agg(bit_or(col("bit")).as("bits"))

  /** Probe: one row per input row of `candidates`, keyed by `idCol`, with
    * `maybe_present` = all k bits set (no false negatives; false
    * positives at the design rate). The filter side is broadcast. */
  def probe(candidates: DataFrame, idCol: String, keyCol: Column,
      bloom: DataFrame, m: Int = DefaultM, k: Int = DefaultK): DataFrame =
    candidates.select(col(idCol), PortableHash.baseHash(keyCol).as("h"))
      .select(col(idCol), explode(positions(col("h"), m, k)).as("pos"))
      .select(col(idCol), expr("pos div 63").as("word"), bitOfPos.as("bit"))
      .join(broadcast(bloom), Seq("word"), "left")
      .select(col(idCol),
        coalesce(col("bits").bitwiseAND(col("bit")) =!= 0, lit(false)).as("hit"))
      .groupBy(col(idCol)).agg(bool_and(col("hit")).as("maybe_present"))

  /** DuckDB SQL fragments mirroring [[build]] and [[probe]] for a key
    * expression `keyExpr` over table `tbl`: a CTE list ending in
    * `bloom(word, bits)`. */
  def buildSql(tbl: String, keyExpr: String, m: Int = DefaultM, k: Int = DefaultK): String = {
    val posList = (0 until k)
      .map(j => s"(${PortableHash.minhashSql("h", j)}) % $m").mkString("[", ", ", "]")
    s"""bh AS (SELECT ${PortableHash.baseHashSql(keyExpr)} AS h FROM $tbl),
       |pos AS (SELECT unnest($posList) AS pos FROM bh),
       |bloom AS (SELECT pos // 63 AS word,
       |            bit_or(1::BIGINT << (pos % 63)::INT) AS bits
       |          FROM pos GROUP BY pos // 63)""".stripMargin
  }

  /** DuckDB SQL CTEs probing `bloom` with `keyExpr` of `tbl`, keyed by
    * `idExpr`: ends in `probed(id, maybe_present)`. */
  def probeSql(tbl: String, idExpr: String, keyExpr: String,
      m: Int = DefaultM, k: Int = DefaultK): String = {
    val posList = (0 until k)
      .map(j => s"(${PortableHash.minhashSql("h", j)}) % $m").mkString("[", ", ", "]")
    s"""ch AS (SELECT $idExpr AS id, ${PortableHash.baseHashSql(keyExpr)} AS h FROM $tbl),
       |cpos AS (SELECT id, unnest($posList) AS pos FROM ch),
       |probed AS (SELECT id,
       |             bool_and(coalesce((b.bits & (1::BIGINT << (cpos.pos % 63)::INT)) <> 0,
       |                               false)) AS maybe_present
       |           FROM cpos LEFT JOIN bloom b ON cpos.pos // 63 = b.word
       |           GROUP BY id)""".stripMargin
  }
}
