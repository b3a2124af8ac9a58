package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) addresses for multi-dimensional data clustering — the
  * layout primitive behind lakehouse `OPTIMIZE ZORDER BY`: interleave the
  * bits of two sort dimensions so that range-partitioning on ONE address
  * column yields files whose min/max footers are tight boxes in BOTH
  * dimensions. A 2-D range predicate then prunes to the files whose box
  * intersects it (~perimeter of the query box) instead of scanning every
  * file the way any single-column sort forces for the second dimension.
  * At 100 TB this is scan-avoidance that costs one write-side sort and
  * zero read-side work — parquet row-group stats do the skipping.
  *
  * The spread is the standard 2-D magic-mask sequence (every other bit —
  * NOT the 3-D every-third-bit constants, an easy and silent mixup the
  * quad-partition spec exists to catch), expressed as shared SQL text
  * over BIGINT `&`/`|`/`<<` — identical integer arithmetic in Spark and
  * DuckDB, the same portability pattern as the HLL/moment formula texts.
  * 31 bits per dimension (z stays in 62 bits, positive); wider domains
  * alias on the low bits — pre-scale or hash them first, as `cluster`
  * documents.
  */
object ZOrder {

  private val masks = Seq(
    16 -> 0x0000ffff0000ffffL,
    8  -> 0x00ff00ff00ff00ffL,
    4  -> 0x0f0f0f0f0f0f0f0fL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** SQL text spreading the low 31 bits of `c` into even bit positions.
    * The fold duplicates the accumulator (the classic x = (x | x<<s) & m
    * chain has data dependencies SQL can't name without nested selects);
    * engines share subexpressions or not — the VALUE is identical. */
  def spreadSql(c: String): String =
    masks.foldLeft(s"(CAST($c AS BIGINT) & ${Int.MaxValue})") {
      case (acc, (sh, m)) => s"(($acc | ($acc << $sh)) & $m)"
    }

  /** 62-bit z-address of (x, y): x on even bits, y on odd bits. */
  def zSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  def z(x: String, y: String): Column = expr(zSql(x, y))

  /** Inverse spread (compaction of even bits) — the round-trip witness
    * the property spec pins: unspread(spread(v)) == v for any 31-bit v. */
  def unspreadSql(c: String): String = {
    val steps = Seq(
      1  -> 0x3333333333333333L,
      2  -> 0x0f0f0f0f0f0f0f0fL,
      4  -> 0x00ff00ff00ff00ffL,
      8  -> 0x0000ffff0000ffffL,
      16 -> Int.MaxValue.toLong)
    steps.foldLeft(s"(CAST($c AS BIGINT) & ${0x5555555555555555L})") {
      case (acc, (sh, m)) => s"(($acc | ($acc >> $sh)) & $m)"
    }
  }

  /** Cluster `df` for 2-D data skipping: range-partition into `files`
    * slices of the z-curve and sort within each, so every written file
    * owns a contiguous z-range (a tight box in both dimensions). Callers
    * write the result with plain parquet — footer min/max stats carry
    * the layout to every future scan. */
  def cluster(df: DataFrame, x: String, y: String, files: Int): DataFrame = {
    val withZ = df.withColumn("__z", z(x, y))
    withZ.repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
