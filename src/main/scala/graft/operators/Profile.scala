package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column profiling for data-quality gates: one pass over the table
  * producing per-column null counts, distinct counts, and min/max.
  *
  * All per-column statistics are computed in a single aggregate (one scan,
  * one reduce) and then unpivoted driver-free via an explode over a
  * literal array — no per-column jobs, no collect. At 100 TB swap the
  * exact `count(DISTINCT)` for `approx_count_distinct` (the exact form is
  * kept here because it is oracle-checkable).
  */
object Profile {

  /** Long-format profile: (column, n_nulls, n_distinct, min_val, max_val).
    * Doubles are rounded to 2dp before string rendering (engine-portable). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    def render(c: String) = df.schema(c).dataType.typeName match {
      case "double" | "float" => (x: org.apache.spark.sql.Column) => round(x, 2).cast("string")
      case _ => (x: org.apache.spark.sql.Column) => x.cast("string")
    }
    val aggs = cols.flatMap { c =>
      val r = render(c)
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$c"),
        countDistinct(col(c)).as(s"_distinct_$c"),
        r(min(col(c))).as(s"_min_$c"),
        r(max(col(c))).as(s"_max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.map(c => struct(
      lit(c).as("column"),
      col(s"_nulls_$c").as("n_nulls"),
      col(s"_distinct_$c").as("n_distinct"),
      col(s"_min_$c").as("min_val"),
      col(s"_max_$c").as("max_val"))): _*)
    wide.select(explode(entries).as("p")).select(col("p.*"))
  }

  /** Fixed-width histogram of a numeric column: bucket i covers
    * `[i·width, (i+1)·width)`, values ≥ nBuckets·width clamp into the
    * last bucket. Fixed bounds (not data-driven min/max) keep the
    * operator a single scan-parallel pass — no pre-pass to find the
    * range — and make bucket ids pure integer floors, portable to any
    * engine. */
  def histogram(df: DataFrame, c: String, width: Double, nBuckets: Int): DataFrame =
    df.select(least(floor(col(c) / width), lit(nBuckets - 1)).cast("int").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

  /** Key-skew profile of a prospective join/aggregation key: group-size
    * quantiles plus the hottest key's share — the numbers that decide
    * whether a key needs salting or a degree cap BEFORE the expensive
    * join runs. One aggregation over the key, one tiny aggregation over
    * the group sizes. Shares are exact integer ratios scaled to basis
    * points, so the output is engine-portable. */
  def keySkew(df: DataFrame, key: String): DataFrame = {
    val sizes = df.groupBy(col(key)).agg(count(lit(1)).as("sz"))
    sizes.agg(
      count(lit(1)).as("n_keys"),
      sum(col("sz")).as("n_rows"),
      max(col("sz")).as("max_group"),
      // floor before the integer cast: Spark's cast truncates but
      // DuckDB's ::BIGINT rounds — floor makes both exact
      floor(expr("percentile(sz, 0.5D)")).as("p50_group"),
      floor(expr("percentile(sz, 0.99D)")).as("p99_group"))
      .select(col("n_keys"), col("n_rows"), col("max_group"),
        col("p50_group"), col("p99_group"),
        expr("max_group * 10000 div n_rows").as("top_share_bp"))
  }

  /** Approximate heavy hitters (Spark's `stat.freqItems`, the
    * Karp/Misra-Gries family) cross-checked against the exact frequency
    * table: emits every key whose exact share exceeds `support`, with a
    * flag saying whether the single-pass sketch surfaced it. The sketch
    * guarantees NO false negatives above the support threshold, so the
    * flag column is constant 1 — which is exactly what the oracle (that
    * never runs the sketch) asserts. The sketch result is one array row
    * (collected like a broadcast build side, not a per-row action); the
    * exact side is one map-side-combined aggregation. */
  def heavyHitters(df: DataFrame, key: org.apache.spark.sql.Column,
      support: Double): DataFrame = {
    val keyed = df.select(key.as("k"))
    // freqItems sizes its Misra-Gries sketch as (1/support).toInt counters
    // — a TRUNCATION, so a non-integral reciprocal (e.g. 0.15 → 6
    // counters) would only guarantee keys above n/6, quietly weaker than
    // the requested threshold. Feed it the support whose reciprocal is
    // the next integer up: same-or-stronger guarantee at every input.
    val sketchSupport = 1.0 / math.ceil(1.0 / support)
    val sketch = keyed.stat.freqItems(Seq("k"), sketchSupport)
      .head().getSeq[Any](0).toSet
    val counts = keyed.groupBy(col("k")).agg(count(lit(1)).as("freq"))
    val total = counts.agg(sum(col("freq")).as("n"))
    // isin is three-valued on a NULL key (NULL, not false) — a NULL
    // heavy hitter must still get a definite 0/1 flag
    val found = when(col("k").isNull,
        lit(if (sketch.contains(null)) 1 else 0))
      .otherwise(col("k").isin(sketch.toSeq.filter(_ != null): _*).cast("int"))
    counts.join(broadcast(total))
      .filter(col("freq") > lit(support) * col("n"))
      .select(col("k"), col("freq"), found.as("found_by_sketch"))
  }

  // Shared formula text for p06 — the SAME strings feed Spark's selectExpr
  // and the DuckDB oracle, so the two engines execute the identical IEEE
  // double expression tree over identical exact integer sums. sqrt (not
  // pow(x,1.5)): IEEE requires sqrt be correctly rounded, so it is
  // bit-identical across engines where pow's last ulp is libm's choice.
  private[operators] val momentMean = "d1 / nd"
  private[operators] val momentM2 = "d2 / nd - mean * mean"
  private[operators] val momentM3 =
    "d3 / nd - 3 * mean * (d2 / nd) + 2 * mean * mean * mean"
  private[operators] val momentM4 =
    "d4 / nd - 4 * mean * (d3 / nd) + 6 * mean * mean * (d2 / nd) - 3 * mean * mean * mean * mean"
  private[operators] val momentSkew = "round(m3 / (m2 * sqrt(m2)), 6)"
  private[operators] val momentKurt = "round(m4 / (m2 * m2) - 3, 6)"

  /** Distribution moments per group: mean, skewness, excess kurtosis of a
    * price column, from one aggregation pass.
    *
    * FP sums re-order across partitions, so double power sums are not
    * reproducible; instead the raw moments s1..s4 are EXACT integer sums
    * of cent powers (decimal(38,0) — cents⁴ ≈ 10²⁸ per row, well inside
    * 38 digits at any gated SF), and the float math happens once,
    * driver-deterministic, on the three aggregated rows. One scan,
    * map-side-combined, order-independent — the same integer-cents trick
    * p04 uses, taken to 4th powers. */
  def moments(df: DataFrame, group: String, price: String): DataFrame =
    df.selectExpr(group, s"CAST(round($price * 100) AS DECIMAL(16,0)) AS c")
      .groupBy(col(group)).agg(
        count(lit(1)).as("n"),
        sum(col("c")).as("s1"), sum(expr("c*c")).as("s2"),
        sum(expr("c*c*c")).as("s3"), sum(expr("c*c*c*c")).as("s4"))
      .selectExpr(group, "n", "CAST(n AS DOUBLE) AS nd",
        "CAST(s1 AS DOUBLE) AS d1", "CAST(s2 AS DOUBLE) AS d2",
        "CAST(s3 AS DOUBLE) AS d3", "CAST(s4 AS DOUBLE) AS d4")
      .selectExpr(group, "n", "nd", s"$momentMean AS mean", "d2", "d3", "d4")
      .selectExpr(group, "n", "mean",
        s"$momentM2 AS m2", s"$momentM3 AS m3", s"$momentM4 AS m4")
      .selectExpr(group, "n", "round(mean / 100, 4) AS mean_price",
        s"$momentSkew AS skewness", s"$momentKurt AS kurtosis")

  /** Robust per-group outlier detection — median / MAD (median absolute
    * deviation), the estimator family that survives the heavy tails and
    * corrupt values mean/stddev choke on. Everything is exact integer
    * cents: the median is the LOWER median (1-based rank (n+1) div 2 —
    * DuckDB's quantile_disc(0.5) convention), MAD is the lower median of
    * |v − med|, and a row is an outlier when |v − med| > k·MAD — integer
    * comparisons end to end, no interpolation or float moments anywhere.
    *
    * Three corpus passes (median, deviation median, probe) — the
    * irreducible price of exact robust statistics; each pass rides
    * [[Relational.distributionRanks]]' range-partitioned two-pass ranks,
    * so no pass sorts a group in one task (the q36/q51 guarantee). The
    * per-group median/MAD tables are group-sized and broadcast back. */
  def madOutliers(df: DataFrame, group: String, value: String,
      k: Int = 3): DataFrame = {
    val cents = df.selectExpr(group, s"CAST(round($value * 100) AS BIGINT) AS v")
    val counts = cents.groupBy(col(group)).agg(count(lit(1)).as("n"))
      .withColumn("mrank", expr("(n + 1) div 2"))
    def lowerMedian(in: DataFrame, c: String, out: String) =
      Relational.distributionRanks(in, Seq(group), Seq(col(c)), ntiles = 2)
        .join(broadcast(counts), group)
        .filter(col("cume_n") === col("mrank"))
        .select(col(group), col(c).as(out))
    val med = lowerMedian(cents, "v", "med_cents")
    val dev = cents.join(broadcast(med), group)
      .select(col(group), abs(col("v") - col("med_cents")).as("d"))
    val mad = lowerMedian(dev, "d", "mad_cents")
    cents.join(broadcast(med), group).join(broadcast(mad), group)
      .groupBy(col(group))
      .agg(count(lit(1)).as("n"),
        min(col("med_cents")).as("med_cents"),
        min(col("mad_cents")).as("mad_cents"),
        sum(when(abs(col("v") - col("med_cents")) > lit(k) * col("mad_cents"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col(group))
  }

  /** Certified mergeable-sketch quantiles: per-slice
    * [[graft.functions.HdrSketch]] partials (the persisted increments of
    * a 100 TB pipeline), merged by plain bucket-count addition, yielding
    * quantile estimates that the query itself certifies two ways:
    *
    *  - `merge_ok`: the slice-merged sketch equals the whole-corpus
    *    sketch bucket-for-bucket (the d11 exact-merge property, here for
    *    quantiles);
    *  - `within_bound`: each estimate is within the sketch's guaranteed
    *    relative error of the EXACT rank-based quantile — an integer
    *    inequality, `64·|est − exact| ≤ exact`.
    *
    * The exact arm uses [[Relational.distributionRanks]] (range-
    * partitioned two-pass global ranks), so even the certificate is
    * scale-safe — no global sort, no percentile over raw rows. The only
    * single-task structures are the merged bucket table and the
    * rank/probability tables, all constant-bounded (< 1 888 buckets for
    * any long value, |ps| rows). Rank convention: the ⌈p·n/100⌉-th
    * smallest (1-based) — integer-exact in both engines, no
    * interpolation-formula ulp hazards. */
  def certifiedQuantiles(li: DataFrame, ps: Seq[Int] = Seq(25, 50, 75, 95, 99),
      slices: Int = 4): DataFrame = {
    import li.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val sb = graft.functions.HdrSketch.SubBuckets // 32
    val cents = li.select(round(col("l_extendedprice") * 100).cast("long").as("v"),
      pmod(col("l_orderkey"), lit(slices)).as("slice"))
    val perSlice = cents.groupBy(col("slice"))
      .agg(graft.functions.HdrSketch.sketch(col("v")).as("sk"))
    val merged = perSlice.select(explode(col("sk")).as("e"))
      .select(col("e._1").as("bucket"), col("e._2").as("cnt0"))
      .groupBy(col("bucket")).agg(sum(col("cnt0")).as("cnt"))
    val whole = cents.agg(graft.functions.HdrSketch.sketch(col("v")).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e._1").as("bucket"), col("e._2").as("cnt2"))
    val mergeOk = merged.join(whole, Seq("bucket"), "full")
      .agg(min(when(col("cnt") === col("cnt2"), 1).otherwise(0)).as("merge_ok"))
    val nDf = cents.agg(count(lit(1)).as("n"))
    // constant-size tables from here down (≤ MaxBuckets rows)
    // deliberately GLOBAL window over a bounded table (≤ MaxBuckets
    // rows) — single-partition execution is the design; the WindowExec
    // scale warning for this shape is logger-silenced in GraftSession
    // (a constant partitionBy key gets constant-folded out of the spec)
    val cum = merged.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("bucket"))))
    val ranks = ps.toDF("p").crossJoin(nDf)
      .withColumn("rank", ceil(col("p") * col("n") / 100.0).cast("long"))
      .select(col("p"), col("rank"))
    val estExpr = expr(
      s"""CASE WHEN bucket < ${2 * sb} THEN CAST(bucket AS BIGINT)
         |ELSE shiftleft(CAST(bucket - ((bucket div $sb) - 1) * $sb AS BIGINT),
         |       (bucket div $sb) - 1)
         |     + shiftleft(CAST(1 AS BIGINT), (bucket div $sb) - 2) END""".stripMargin)
    val pick = ranks.join(cum, col("cum") >= col("rank"))
      .groupBy(col("p"), col("rank")).agg(min(col("bucket")).as("bucket"))
      .withColumn("est_cents", estExpr)
    val dr = Relational.distributionRanks(cents.select(col("v")), Seq.empty,
        Seq(col("v")), ntiles = 2)
      .select(col("v"), col("cume_n"))
    val exact = ranks.join(dr, col("cume_n") === col("rank"))
      .select(col("p").as("pe"), col("v").as("exact_cents"))
    pick.join(exact, col("p") === col("pe"))
      .crossJoin(mergeOk)
      .select(col("p"), col("est_cents"), col("exact_cents"), col("merge_ok"),
        when(abs(col("est_cents") - col("exact_cents")) * (2 * sb) <= col("exact_cents"), 1)
          .otherwise(0).as("within_bound"))
      .orderBy(col("p"))
  }

  // Shared HLL estimator text (p08/p12) — the same string feeds Spark's
  // expr and the DuckDB oracle. Every literal is CAST to DOUBLE explicitly:
  // bare decimal literals parse as DECIMAL in both engines, with
  // engine-specific scales — casting first makes the whole tree identical
  // IEEE double arithmetic over the exact integer s_total. floor-then-cast
  // because Spark's BIGINT cast truncates while DuckDB's rounds.
  //
  // Includes the Flajolet et al. 2007 §4 small-range correction: when the
  // raw estimate is below 2.5m and empty registers remain, switch to
  // linear counting m*ln(m/V) over the zero-register count V — without it
  // the raw estimator overshoots by ~60% at n ≈ 0.7m (observed: 556 for
  // an exact 350 at m=512), sinking any small-corpus use. The branch
  // condition is a pure integer comparison (floored raw estimate vs
  // literal), so both engines always take the same arm; the LC arm's one
  // transcendental, ln over a ratio of integers, evaluates on identical
  // inputs in both engines.
  private[operators] def hllEstFormula(m: Int): String = {
    val raw =
      s"""CAST(floor(CAST(0.7213 AS DOUBLE) /
         |  (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST($m AS DOUBLE))
         |  * CAST($m AS DOUBLE) * CAST($m AS DOUBLE)
         |  * CAST(1099511627776 AS DOUBLE)
         |  / CAST(s_total AS DOUBLE)) AS BIGINT)""".stripMargin
    s"""CASE WHEN $raw < ${5 * m / 2} AND nonzero_registers < $m
       |  THEN CAST(floor(CAST($m AS DOUBLE) * ln(CAST($m AS DOUBLE)
       |    / CAST($m - nonzero_registers AS DOUBLE))) AS BIGINT)
       |  ELSE $raw END""".stripMargin
  }

  /** Certified mergeable distinct-count sketch — HyperLogLog (Flajolet et
    * al. 2007) as a plain declarative aggregation, the distinct-count
    * companion to [[certifiedQuantiles]] / the d11 MinHash pattern.
    *
    * The sketch is a 512-register table `bucket -> max(rho)` built from
    * the engine-portable 32-bit base hash: bucket = top 9 hash bits,
    * rho = leading-zero count of the remaining 23 bits + 1. No UDAF:
    * registers are `groupBy(bucket).agg(max(rho))` — codegen'd,
    * map-side-combined, and (because MAX is a commutative idempotent
    * monoid) ORDER- and SLICING-INVARIANT, so per-slice register tables
    * persisted by an incremental pipeline merge into exactly the
    * whole-corpus registers. The query certifies both properties:
    *
    *  - `merge_ok`: slice-built registers merged by max == whole-corpus
    *    registers, register-for-register (full outer join compare);
    *  - `within_bound`: the HLL estimate is within 15% of the exact
    *    distinct count — >3σ for m=512 (σ ≈ 1.04/√512 ≈ 4.6%) — as an
    *    exact integer inequality.
    *
    * Everything before the single final estimate division is integer
    * arithmetic: rho via the bit-length of the masked hash (string `bin`,
    * no log2 ulp hazards), and the harmonic sum Σ2^-M_j is scaled by 2^40
    * into an EXACT BIGINT (M_j ≤ 24, 512 terms ≤ 2^49), so the one
    * float division is over identical integers in both engines with the
    * shared [[hllEstFormula]] text. At 100 TB the register table is the
    * persisted artifact: 512 rows per corpus slice, folded daily without
    * re-reading old data. */
  /** (bucket, rho, slice) rows for the HLL register build — the per-event
    * stream a register table aggregates. p = 9 bucket bits, 23-bit rho
    * domain, rho via string bit length (engine-portable, no log2). */
  def hllBucketRho(keyed: DataFrame, slices: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val p = 9; val w = 32 - p; val rhoMax = w + 1
    val c = carry.map(col)
    keyed
      .select(c :+ col("k") :+
        graft.functions.PortableHash.baseHash(col("k")).as("h"): _*)
      .select(c :+
        shiftright(col("h"), w).cast("int").as("bucket") :+
        col("h").bitwiseAND(lit((1L << w) - 1)).as("r") :+
        pmod(col("h"), lit(slices)).as("slice"): _*)
      .withColumn("rho",
        when(col("r") === 0, rhoMax).otherwise(lit(rhoMax) - length(expr("bin(r)"))))
  }

  /** The HLL register table of a key column: `bucket -> max(rho)`, at most
    * 512 rows — the artifact an incremental 100 TB pipeline PERSISTS per
    * corpus slice and folds by elementwise max. One map-side-combined
    * aggregation; shuffle is bounded by 512 rows per upstream partition
    * regardless of corpus size. */
  def hllRegisters(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame =
    hllBucketRho(df.select(key.cast("string").as("k")), slices = 1)
      .groupBy(col("bucket")).agg(max(col("rho")).as("m"))

  /** Corpus-overlap estimate from FOLDED HLL register tables — "how much
    * of corpus B is already in corpus A" (decontamination sizing, crawl
    * dedup planning) WITHOUT joining the corpora: each side is scanned
    * once into its 512-row register table, the union sketch is the
    * elementwise max of the two tables (never a rescan — the same fold
    * d11/p08 certify), and inclusion–exclusion gives the intersection:
    * |A∩B| ≈ est(A) + est(B) − est(A∪B). At 100 TB the register tables
    * are the persisted per-corpus artifacts, so overlap between ANY two
    * corpora is a 512-row fold plus one formula — zero data movement.
    *
    * The registered query carries a gate-scale certification arm: the
    * exact intersection (set INTERSECT — the join this operator exists to
    * avoid) and `within_bound`, an integer inequality checking the
    * estimate sits within est_union/4 (generous vs the ~3σ ≈ 14%
    * combined register noise at m = 512, but every quantity is
    * deterministic given the portable hash, so the gate pins exact
    * values, not a tolerance). Estimates use the shared
    * [[hllEstFormula]] text — identical IEEE arithmetic in both engines
    * over exact integer register sums. */
  /** The estimate arm alone (no exact INTERSECT) — what a production
    * pipeline runs: three 512-row register folds, the corpora are never
    * joined. [[sketchOverlap]] adds the gate's exact cross-check. */
  def overlapEstimates(a: DataFrame, b: DataFrame,
      key: org.apache.spark.sql.Column): DataFrame = {
    val m = 1 << 9
    val ra = hllRegisters(a, key)
    val rb = hllRegisters(b, key)
    val ru = ra.unionByName(rb).groupBy(col("bucket")).agg(max(col("m")).as("m"))
    def est(regs: DataFrame, name: String) = regs
      .agg(count(lit(1)).as("nonzero_registers"),
        sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 40 - m) AS BIGINT)")).as("s_present"))
      .withColumn("s_total",
        col("s_present") + (lit(m.toLong) - col("nonzero_registers")) * lit(1L << 40))
      .select(expr(hllEstFormula(m)).as(name))
    est(ra, "est_a").crossJoin(est(rb, "est_b")).crossJoin(est(ru, "est_union"))
      .withColumn("est_inter",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
  }

  def sketchOverlap(a: DataFrame, b: DataFrame,
      key: org.apache.spark.sql.Column): DataFrame = {
    val exact = a.select(key.cast("string").as("k"))
      .intersect(b.select(key.cast("string").as("k")))
      .agg(count(lit(1)).as("exact_inter"))
    overlapEstimates(a, b, key)
      .crossJoin(exact)
      .select(col("est_a"), col("est_b"), col("est_union"), col("est_inter"),
        col("exact_inter"),
        when(abs(col("est_inter") - col("exact_inter")) * 4 <= col("est_union"), 1)
          .otherwise(0).as("within_bound"))
  }

  /** Per-group distinct-count sketch — p08's register table keyed by a
    * group column ("distinct users per event type / domain / day"), the
    * grouped reach question every dashboard asks. State is groups × 512
    * registers regardless of corpus size; small groups sit in the shared
    * formula's linear-counting arm (the p12 correction), so a 150-key
    * group estimates within ~2%, not the raw estimator's +60%. The gate
    * certifies within_bound per group against the exact distinct count. */
  def groupedDistinctSketch(df: DataFrame, group: String,
      key: org.apache.spark.sql.Column): DataFrame = {
    val m = 1 << 9
    val keyed = df.select(col(group), key.cast("string").as("k"))
    val regs = hllBucketRho(keyed, slices = 1, carry = Seq(group))
      .groupBy(col(group), col("bucket")).agg(max(col("rho")).as("m"))
    val stats = regs.groupBy(col(group))
      .agg(count(lit(1)).as("nonzero_registers"),
        sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 40 - m) AS BIGINT)")).as("s_present"))
      .withColumn("s_total",
        col("s_present") + (lit(m.toLong) - col("nonzero_registers")) * lit(1L << 40))
      .withColumn("est_distinct", expr(hllEstFormula(m)))
    val exact = keyed.groupBy(col(group)).agg(countDistinct(col("k")).as("n_exact"))
    stats.join(exact, group)
      .select(col(group), col("n_exact"), col("est_distinct"),
        col("nonzero_registers"),
        when(abs(col("est_distinct") - col("n_exact")) * 100 <= lit(15) * col("n_exact"), 1)
          .otherwise(0).as("within_bound"))
      .orderBy(col(group))
  }

  def certifiedDistinct(df: DataFrame, key: org.apache.spark.sql.Column,
      slices: Int = 4): DataFrame = {
    val m = 1 << 9
    val base = df.select(key.cast("string").as("k"))
    val br = hllBucketRho(base, slices)
    val whole = br.groupBy(col("bucket")).agg(max(col("rho")).as("m"))
    val merged = br.groupBy(col("slice"), col("bucket")).agg(max(col("rho")).as("ms"))
      .groupBy(col("bucket")).agg(max(col("ms")).as("m2"))
    val mergeOk = whole.join(merged, Seq("bucket"), "full")
      .agg(min(when(col("m") === col("m2"), 1).otherwise(0)).as("merge_ok"))
    val stats = whole.agg(
      count(lit(1)).as("nonzero_registers"),
      sum(col("m")).cast("long").as("register_sum"),
      sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 40 - m) AS BIGINT)")).as("s_present"))
      .withColumn("s_total",
        col("s_present") + (lit(m.toLong) - col("nonzero_registers")) * lit(1L << 40))
    val exact = base.agg(countDistinct(col("k")).as("n_exact"))
    stats.crossJoin(exact).crossJoin(mergeOk)
      .withColumn("est_distinct", expr(hllEstFormula(m)))
      .select(col("n_exact"), col("est_distinct"), col("nonzero_registers"),
        col("register_sum"), col("merge_ok"),
        when(abs(col("est_distinct") - col("n_exact")) * 100 <= lit(15) * col("n_exact"), 1)
          .otherwise(0).as("within_bound"))
  }

  /** Certified mergeable frequency sketch — count-min (Cormode &
    * Muthukrishnan 2005) as a plain declarative aggregation, the
    * point-frequency companion to [[certifiedDistinct]] /
    * [[certifiedQuantiles]] / the d11 MinHash pattern.
    *
    * The sketch is a `depth × width` counter table built by exploding each
    * key into `depth` (row, column) cells — column = the row's affine hash
    * of the portable base hash, mod width — and counting per cell:
    * `groupBy(r, c).count`, codegen'd and map-side-combined. Because SUM
    * is a commutative monoid over the FIXED cell grid, per-slice counter
    * tables persisted by an incremental pipeline merge by plain addition
    * into exactly the whole-corpus sketch; a point estimate is the MIN
    * over the key's `depth` cells. The query certifies:
    *
    *  - `merge_ok`: slice-built counters summed == whole-corpus counters,
    *    cell-for-cell (the d11 property for the sum monoid);
    *  - `over_ok`: est ≥ exact for every probe key — count-min never
    *    undercounts (deterministic, not probabilistic);
    *  - `within_bound`: est − exact ≤ 3·N/width, the ~3× expected
    *    collision mass (holds with prob ≈ 1−3^-depth per key; checked as
    *    the same integer inequality on both engines).
    *
    * At 100 TB the counter table is the persisted artifact: depth·width
    * rows per corpus slice, folded daily by addition; shuffle is bounded
    * by depth·width partial rows per upstream partition regardless of
    * corpus size. */
  // Shared Pearson-correlation formula text (p10) — the same strings feed
  // Spark's selectExpr and the DuckDB oracle over identical exact integer
  // sums (the p06 technique): the one float stage is identical IEEE
  // arithmetic, not two engines' built-in corr() implementations.
  private[operators] val corrNum = "nd * sxy - sx * sy"
  private[operators] val corrDen =
    "sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy))"

  /** Pearson correlation of two numeric columns per group, from one
    * aggregation pass of EXACT integer power/cross sums (decimal(38,0) —
    * x ≤ 2^6, y = cents ≤ 2^24 keep Σx²/Σy²/Σxy inside 38 digits at any
    * gated SF). Order-independent, map-side-combined; the float division
    * happens once per group on the aggregated row — engine-portable where
    * built-in corr()s differ in summation strategy (Welford vs naive) and
    * order. The profiling companion to [[moments]]: does quantity predict
    * price, per segment, measured without a second scan. */
  def correlation(df: DataFrame, group: String, x: String,
      price: String): DataFrame =
    df.selectExpr(group, s"CAST(round($x) AS DECIMAL(16,0)) AS x",
        s"CAST(round($price * 100) AS DECIMAL(16,0)) AS y")
      .groupBy(col(group)).agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("isx"), sum(col("y")).as("isy"),
        sum(expr("x*x")).as("isxx"), sum(expr("y*y")).as("isyy"),
        sum(expr("x*y")).as("isxy"))
      .selectExpr(group, "n", "CAST(n AS DOUBLE) AS nd",
        "CAST(isx AS DOUBLE) AS sx", "CAST(isy AS DOUBLE) AS sy",
        "CAST(isxx AS DOUBLE) AS sxx", "CAST(isyy AS DOUBLE) AS syy",
        "CAST(isxy AS DOUBLE) AS sxy")
      .selectExpr(group, "n", s"round(($corrNum) / ($corrDen), 6) AS corr")

  /** Two-sample distribution drift — per-bucket chi-square contributions
    * between two deterministic corpus slices, the monitoring pass a
    * continuously-ingested training corpus runs to detect that today's
    * data no longer looks like yesterday's before a model does.
    *
    * Per fixed-width bucket i (the [[histogram]] binning): the standard
    * two-sample chi-square term `(aᵢ·N_b − bᵢ·N_a)² / (N_a·N_b·(aᵢ+bᵢ))`,
    * emitted in exact integer micro-units via decimal(38,0) integral
    * division — each factor is a BIGINT, the products live in decimal, so
    * both engines compute the identical value (no libm, no float sums; a
    * consumer thresholds Σ terms against the χ² critical value). One
    * scan, one map-side-combined aggregation, |buckets| output rows. */
  def driftChi2(df: DataFrame, value: org.apache.spark.sql.Column,
      side: org.apache.spark.sql.Column, width: Double,
      nBuckets: Int): DataFrame = {
    val b = df.select(
      least(floor(value / width), lit(nBuckets - 1)).cast("int").as("bucket"),
      side.cast("int").as("side"))
    val counts = b.groupBy(col("bucket")).agg(
      sum(when(col("side") === 0, 1L).otherwise(0L)).as("a_cnt"),
      sum(when(col("side") =!= 0, 1L).otherwise(0L)).as("b_cnt"))
    val tot = counts.agg(sum(col("a_cnt")).as("na"), sum(col("b_cnt")).as("nb"))
    counts.crossJoin(broadcast(tot))
      .selectExpr("bucket", "a_cnt", "b_cnt",
        """CAST(CAST(1000000 AS DECIMAL(38,0))
           |  * (a_cnt * nb - b_cnt * na) * (a_cnt * nb - b_cnt * na)
           |  div (CAST(na AS DECIMAL(38,0)) * nb * (a_cnt + b_cnt))
           |  AS BIGINT) AS chi2_term_micro""".stripMargin)
      .orderBy(col("bucket"))
  }

  /** The depth cells (r, c) a key occurrence lands in — the single
    * definition of the CMS cell mapping ([[certifiedFreq]] and the
    * standalone counter build below must agree). */
  private def cmsCellCols(depth: Int, width: Int)(
      h: org.apache.spark.sql.Column) =
    array((0 until depth).map(i => struct(lit(i).as("r"),
      pmod(graft.functions.PortableHash.minhash(h, i), lit(width)).as("c"))): _*)

  /** The count-min counter table of a key column: `(r, c) -> cnt`, at most
    * depth·width rows — the artifact an incremental 100 TB pipeline
    * PERSISTS per corpus slice and folds by elementwise addition. One
    * map-side-combined aggregation; shuffle is bounded by depth·width
    * partial rows per upstream partition regardless of corpus size. */
  def cmsCounters(df: DataFrame, key: org.apache.spark.sql.Column,
      depth: Int = 4, width: Int = 64): DataFrame =
    df.select(key.cast("long").as("k"))
      .select(graft.functions.PortableHash.baseHash(col("k").cast("string")).as("h"))
      .select(explode(cmsCellCols(depth, width)(col("h"))).as("e"))
      .groupBy(col("e.r").as("r"), col("e.c").as("c"))
      .agg(count(lit(1)).as("cnt"))

  def certifiedFreq(df: DataFrame, key: org.apache.spark.sql.Column,
      depth: Int = 4, width: Int = 64, probes: Int = 10,
      slices: Int = 4): DataFrame = {
    import graft.functions.PortableHash
    val keyed = df.select(key.cast("long").as("k"))
    val n = keyed.agg(count(lit(1)).as("n_total"))
    val cellCols = cmsCellCols(depth, width) _
    val cells = keyed
      .select(col("k"), PortableHash.baseHash(col("k").cast("string")).as("h"))
      .select(pmod(col("k"), lit(slices)).as("slice"),
        explode(cellCols(col("h"))).as("e"))
      .select(col("slice"), col("e.r"), col("e.c"))
    val whole = cells.groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))
    val merged = cells.groupBy(col("slice"), col("r"), col("c"))
      .agg(count(lit(1)).as("cs"))
      .groupBy(col("r"), col("c")).agg(sum(col("cs")).as("cnt2"))
    val mergeOk = whole.join(merged, Seq("r", "c"), "full")
      .agg(min(when(col("cnt") === col("cnt2"), 1).otherwise(0)).as("merge_ok"))
    val probe = df.sparkSession.range(probes).select(col("id").as("pk"))
      .select(col("pk"), PortableHash.baseHash(col("pk").cast("string")).as("h"))
      .select(col("pk"), explode(cellCols(col("h"))).as("e"))
      .select(col("pk"), col("e.r"), col("e.c"))
    val est = probe.join(whole, Seq("r", "c"), "left")
      .groupBy(col("pk")).agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
    val exact = keyed.filter(col("k") < probes)
      .groupBy(col("k")).agg(count(lit(1)).as("cnt_exact"))
    est.join(exact, col("pk") === col("k"), "left")
      .select(col("pk"), coalesce(col("cnt_exact"), lit(0L)).as("n_exact"),
        col("est"))
      .crossJoin(mergeOk).crossJoin(n)
      .select(col("pk"), col("n_exact"), col("est"), col("merge_ok"),
        (col("est") >= col("n_exact")).cast("int").as("over_ok"),
        ((col("est") - col("n_exact")) * width <= lit(3) * col("n_total"))
          .cast("int").as("within_bound"))
      .orderBy(col("pk"))
  }

  /** One declarative data-quality constraint (the Deequ / dbt-test shape):
    * `numer` is an aggregate counting satisfying units and `minBp` the
    * minimum fraction of the table, in exact integer basis points, the
    * constraint demands. The audit's metric is `10000·numer div count(*)`
    * — integer arithmetic end-to-end, so the pass/fail verdict can never
    * flip on float summation order. Names must be identifier-shaped
    * (they are spliced into column names and `expr` text). */
  final case class Constraint(name: String, numer: Column, minBp: Long)

  object Constraint {
    /** Completeness: fraction of rows where `c` is non-null. */
    def complete(name: String, c: Column, minBp: Long = 10000): Constraint =
      Constraint(name, count(c), minBp)
    /** Compliance: fraction of rows satisfying `pred` (null ⇒ violating). */
    def satisfies(name: String, pred: Column, minBp: Long = 10000): Constraint =
      Constraint(name, sum(coalesce(pred, lit(false)).cast("long")), minBp)
    /** Uniqueness: distinct values per row — 10000 bp iff `c` is a key. */
    def unique(name: String, c: Column, minBp: Long = 10000): Constraint =
      Constraint(name, countDistinct(c), minBp)
  }

  /** Single-pass constraint verification: ALL checks evaluate inside one
    * aggregate over one scan (partial-merge, no per-check jobs), then one
    * literal-array explode unpivots the wide row into
    * `(constraint, metric_bp, threshold_bp, passed)` — the [[profile]]
    * pattern. An empty table passes vacuously (every constraint is a
    * universally-quantified claim over zero rows). At 100 TB this is one
    * map-side-combined scan regardless of how many constraints the suite
    * declares — the whole point of the Deequ design. */
  def constraintAudit(df: DataFrame, checks: Seq[Constraint]): DataFrame = {
    val aggs = count(lit(1)).as("_n") +:
      checks.map(k => k.numer.cast("long").as(s"_m_${k.name}"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(checks.map { k =>
      struct(lit(k.name).as("constraint"),
        when(col("_n") === 0, lit(10000L))
          .otherwise(expr(s"10000 * _m_${k.name} div _n")).as("metric_bp"),
        lit(k.minBp).as("threshold_bp"))
    }: _*)
    wide.select(explode(entries).as("c")).select(col("c.*"))
      .withColumn("passed", (col("metric_bp") >= col("threshold_bp")).cast("int"))
      .orderBy(col("constraint"))
  }

  val queries: Seq[Q] = Seq(
    Q("p01_profile",
      (s, dir) => profile(Tables.load(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
        .orderBy(col("column")), {
        def one(c: String, rendered: String) =
          s"""SELECT '$c' AS "column",
             |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
             |  count(DISTINCT $c) AS n_distinct,
             |  CAST($rendered AS VARCHAR) AS min_val,
             |  CAST(${rendered.replace("min(", "max(")} AS VARCHAR) AS max_val
             |FROM customer""".stripMargin
        Some(Seq(
          one("c_custkey", "min(c_custkey)"),
          one("c_name", "min(c_name)"),
          one("c_nationkey", "min(c_nationkey)"),
          one("c_acctbal", "round(min(c_acctbal), 2)"),
          one("c_mktsegment", "min(c_mktsegment)"),
        ).mkString("", "\nUNION ALL\n", "\nORDER BY \"column\""))
      }),

    // ---- p02: fixed-width histogram ------------------------------------
    Q("p02_histogram",
      (s, dir) => histogram(Tables.load(s, dir, "lineitem"),
          "l_extendedprice", width = 10000.0, nBuckets = 12)
        .orderBy(col("bucket")),
      Some("""SELECT CAST(least(floor(l_extendedprice / 10000.0), 11) AS INT) AS bucket,
             |  count(*) AS n
             |FROM lineitem
             |GROUP BY 1
             |ORDER BY bucket""".stripMargin)),

    // ---- p03: key-skew profile (pre-join diagnostics) ------------------
    // Profiles events.user_id — the key the streaming/funnel queries
    // group on — reporting group-size quantiles and the hottest key's
    // share in basis points.
    Q("p03_key_skew",
      (s, dir) => keySkew(Tables.load(s, dir, "events"), "user_id"),
      Some("""WITH sizes AS (SELECT user_id, count(*) AS sz
             |               FROM events GROUP BY user_id)
             |SELECT CAST(count(*) AS BIGINT) AS n_keys,
             |  CAST(sum(sz) AS BIGINT) AS n_rows,
             |  CAST(max(sz) AS BIGINT) AS max_group,
             |  CAST(floor(quantile_cont(sz, 0.5)) AS BIGINT) AS p50_group,
             |  CAST(floor(quantile_cont(sz, 0.99)) AS BIGINT) AS p99_group,
             |  CAST(max(sz) * 10000 // sum(sz) AS BIGINT) AS top_share_bp
             |FROM sizes""".stripMargin)),

    // ---- p04: two-phase salted aggregation -----------------------------
    // The hot-key mitigation as a driver-gated query: count + sum per
    // user_id through Skew.saltedAggregate (deterministic event_id salt,
    // 16 shards, partial-then-merge). Salting must be INVISIBLE in the
    // result — the oracle is the plain GROUP BY. The summed value is
    // integer cents (per-row round is exact), because a salted sum of
    // DOUBLEs would re-order FP addition and drift from the oracle's sum
    // in the last ulps; integers are order-independent. PlanSpec pins the
    // two aggregation stages on the executed plan.
    Q("p04_salted_agg",
      (s, dir) => graft.functions.Skew.saltedAggregate(
          Tables.load(s, dir, "events"),
          key = col("user_id"), unique = col("event_id"), salts = 16,
          sums = Map("value_cents" -> round(col("value") * 100).cast("long")))
        .select(col("key").as("user_id"), col("n"), col("value_cents"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
             |FROM events
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // ---- p05: approximate heavy hitters vs exact frequencies -----------
    // Key = floor(sqrt(l_orderkey % 100)): linear density, shares 1%..19%
    // — a portable skewed categorical (floor before any cast: Spark's INT
    // cast truncates, DuckDB's rounds). The oracle computes the exact
    // > 10% keys with found_by_sketch = 1; the Spark side earns that 1
    // from the sketch's no-false-negative guarantee.
    Q("p05_heavy_hitters",
      (s, dir) => heavyHitters(Tables.load(s, dir, "lineitem"),
          floor(sqrt(col("l_orderkey") % 100)).cast("long"), support = 0.1)
        .orderBy(col("k")),
      Some("""WITH k AS (SELECT CAST(floor(sqrt(l_orderkey % 100)) AS BIGINT) AS k
             |          FROM lineitem),
             |c AS (SELECT k, count(*) AS freq FROM k GROUP BY k),
             |t AS (SELECT CAST(sum(freq) AS BIGINT) AS n FROM c)
             |SELECT k, freq, 1 AS found_by_sketch
             |FROM c, t
             |WHERE freq > 0.1 * n
             |ORDER BY k""".stripMargin)),

    // ---- p07: certified mergeable-sketch quantiles ---------------------
    // The oracle rebuilds the SAME HDR sketch in pure integer SQL
    // (bit length via format('{:b}',v) — no ln/ceil ulp hazards), walks
    // the same cumulative ranks, and computes the exact rank-based
    // quantile; merge_ok / within_bound are literal 1 on the oracle side
    // and EARNED on the Spark side (exact slice-merge property + the
    // sketch's 2^-(SubBits+1) relative bound as an integer inequality).
    Q("p07_quantile_sketch",
      (s, dir) => certifiedQuantiles(Tables.load(s, dir, "lineitem")),
      Some("""WITH cents AS (
             |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem),
             |n AS (SELECT count(*) AS n FROM cents),
             |bk AS (SELECT v,
             |    CASE WHEN v < 64 THEN CAST(v AS INT)
             |         ELSE CAST((length(format('{:b}', v)) - 1 - 5) * 32
             |              + (v >> (length(format('{:b}', v)) - 1 - 5)) AS INT) END AS bucket
             |  FROM cents),
             |h AS (SELECT bucket, count(*) AS cnt FROM bk GROUP BY bucket),
             |c AS (SELECT bucket, sum(cnt) OVER (ORDER BY bucket) AS cum FROM h),
             |ps(p) AS (VALUES (25), (50), (75), (95), (99)),
             |r AS (SELECT p, CAST(ceil(p * n / 100.0) AS BIGINT) AS rnk FROM ps, n),
             |pick AS (SELECT p, rnk, min(bucket) AS bucket
             |  FROM r JOIN c ON cum >= rnk GROUP BY p, rnk),
             |est AS (SELECT p, rnk,
             |    CASE WHEN bucket < 64 THEN CAST(bucket AS BIGINT)
             |         ELSE CAST(((bucket - ((bucket // 32) - 1) * 32)
             |              << ((bucket // 32) - 1))
             |              + (1 << ((bucket // 32) - 2)) AS BIGINT) END AS est_cents
             |  FROM pick),
             |ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS r FROM cents)
             |SELECT e.p AS p, e.est_cents, k.v AS exact_cents,
             |  1 AS merge_ok, 1 AS within_bound
             |FROM est e JOIN ranked k ON k.r = e.rnk
             |ORDER BY p""".stripMargin)),

    // ---- p06: distribution moments (skewness / kurtosis) ---------------
    // Exact HUGEINT power sums on the DuckDB side mirror Spark's
    // decimal(38,0) sums; both engines then run the same formula strings
    // (momentM2..momentKurt) over the same exact integers — the float
    // stage is identical IEEE arithmetic, not two engines' libm moments.
    Q("p06_moments",
      (s, dir) => moments(Tables.load(s, dir, "lineitem"),
          "l_returnflag", "l_extendedprice")
        .orderBy(col("l_returnflag")),
      Some(s"""WITH c AS (SELECT l_returnflag,
              |    CAST(round(l_extendedprice * 100) AS HUGEINT) AS c FROM lineitem),
              |a AS (SELECT l_returnflag, count(*) AS n,
              |    sum(c) AS s1, sum(c*c) AS s2, sum(c*c*c) AS s3, sum(c*c*c*c) AS s4
              |  FROM c GROUP BY l_returnflag),
              |d AS (SELECT l_returnflag, CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) AS nd,
              |    CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2,
              |    CAST(s3 AS DOUBLE) AS d3, CAST(s4 AS DOUBLE) AS d4
              |  FROM a),
              |m AS (SELECT l_returnflag, n, nd, $momentMean AS mean, d2, d3, d4 FROM d),
              |mo AS (SELECT l_returnflag, n, mean,
              |    $momentM2 AS m2, $momentM3 AS m3, $momentM4 AS m4
              |  FROM m)
              |SELECT l_returnflag, n, round(mean / 100, 4) AS mean_price,
              |  $momentSkew AS skewness, $momentKurt AS kurtosis
              |FROM mo
              |ORDER BY l_returnflag""".stripMargin)),

    // ---- p09: certified mergeable frequency sketch (count-min) ---------
    // The oracle rebuilds the SAME depth×width counter grid in pure
    // integer SQL from the portable md5 base hash and the same affine row
    // hashes, probes the same keys, and takes the same min — est and
    // n_exact hash-match exactly. merge_ok and over_ok are literal 1 on
    // the oracle side and EARNED on the Spark side (slice-sum == whole;
    // count-min never undercounts); within_bound both sides derive as the
    // same integer inequality vs the exact count.
    Q("p09_freq_sketch",
      (s, dir) => certifiedFreq(Tables.load(s, dir, "lineitem"),
        col("l_partkey") % 997),
      Some {
        import graft.functions.PortableHash
        val depth = 4; val width = 64
        def cellsSql(src: String, keyCol: String) =
          (0 until depth).map(i =>
            s"SELECT $keyCol, $i AS r, (${PortableHash.minhashSql("h", i)}) % $width AS c FROM $src")
            .mkString("\n  UNION ALL ")
        s"""WITH k AS (SELECT l_partkey % 997 AS k FROM lineitem),
           |n AS (SELECT count(*) AS n_total FROM k),
           |h AS (SELECT k, ${PortableHash.baseHashSql("CAST(k AS VARCHAR)")} AS h FROM k),
           |cells AS (
           |  ${cellsSql("h", "k")}),
           |sk AS (SELECT r, c, count(*) AS cnt FROM cells GROUP BY r, c),
           |ps AS (SELECT unnest(range(0, 10)) AS pk),
           |ph AS (SELECT pk, ${PortableHash.baseHashSql("CAST(pk AS VARCHAR)")} AS h FROM ps),
           |pcells AS (
           |  ${cellsSql("ph", "pk")}),
           |est AS (SELECT pk, min(coalesce(cnt, 0)) AS est
           |        FROM pcells LEFT JOIN sk USING (r, c) GROUP BY pk),
           |ex AS (SELECT k AS pk, count(*) AS cnt_exact FROM k WHERE k < 10 GROUP BY k)
           |SELECT e.pk,
           |  CAST(coalesce(ex.cnt_exact, 0) AS BIGINT) AS n_exact,
           |  CAST(e.est AS BIGINT) AS est,
           |  1 AS merge_ok, 1 AS over_ok,
           |  CASE WHEN (e.est - coalesce(ex.cnt_exact, 0)) * $width <= 3 * n_total
           |       THEN 1 ELSE 0 END AS within_bound
           |FROM est e LEFT JOIN ex ON e.pk = ex.pk, n
           |ORDER BY e.pk""".stripMargin
      }),

    // ---- p11: two-sample distribution drift (chi-square terms) ---------
    // Slices = ship-year parity (a REAL temporal split, so price mix
    // genuinely differs), buckets = the p02 histogram binning. Micro-unit
    // integral division keeps every term engine-exact.
    Q("p11_drift",
      (s, dir) => driftChi2(Tables.load(s, dir, "lineitem"),
        col("l_extendedprice"), year(col("l_shipdate")) % 2,
        width = 10000.0, nBuckets = 12),
      Some("""WITH b AS (SELECT
             |    CAST(least(floor(l_extendedprice / 10000.0), 11) AS INT) AS bucket,
             |    year(l_shipdate) % 2 AS side
             |  FROM lineitem),
             |c AS (SELECT bucket,
             |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt,
             |    CAST(sum(CASE WHEN side <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt
             |  FROM b GROUP BY bucket),
             |t AS (SELECT CAST(sum(a_cnt) AS BIGINT) AS na,
             |             CAST(sum(b_cnt) AS BIGINT) AS nb FROM c)
             |SELECT bucket, a_cnt, b_cnt,
             |  CAST(CAST(1000000 AS HUGEINT)
             |       * (a_cnt * nb - b_cnt * na) * (a_cnt * nb - b_cnt * na)
             |       // (CAST(na AS HUGEINT) * nb * (a_cnt + b_cnt))
             |       AS BIGINT) AS chi2_term_micro
             |FROM c, t
             |ORDER BY bucket""".stripMargin)),

    // ---- p10: Pearson correlation from exact integer sums --------------
    // HUGEINT sums on the DuckDB side mirror Spark's decimal(38,0); both
    // engines then run the same formula strings (corrNum/corrDen) over
    // the same exact integers — never each engine's own corr().
    Q("p10_correlation",
      (s, dir) => correlation(Tables.load(s, dir, "lineitem"),
          "l_returnflag", "l_quantity", "l_extendedprice")
        .orderBy(col("l_returnflag")),
      Some(s"""WITH c AS (SELECT l_returnflag,
              |    CAST(round(l_quantity) AS HUGEINT) AS x,
              |    CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
              |  FROM lineitem),
              |a AS (SELECT l_returnflag, count(*) AS n,
              |    sum(x) AS isx, sum(y) AS isy,
              |    sum(x*x) AS isxx, sum(y*y) AS isyy, sum(x*y) AS isxy
              |  FROM c GROUP BY l_returnflag),
              |d AS (SELECT l_returnflag, CAST(n AS BIGINT) AS n,
              |    CAST(n AS DOUBLE) AS nd,
              |    CAST(isx AS DOUBLE) AS sx, CAST(isy AS DOUBLE) AS sy,
              |    CAST(isxx AS DOUBLE) AS sxx, CAST(isyy AS DOUBLE) AS syy,
              |    CAST(isxy AS DOUBLE) AS sxy
              |  FROM a)
              |SELECT l_returnflag, n, round(($corrNum) / ($corrDen), 6) AS corr
              |FROM d
              |ORDER BY l_returnflag""".stripMargin)),

    // ---- p08: certified mergeable distinct-count sketch (HLL) ----------
    // The oracle rebuilds the SAME 512 HLL registers in pure integer SQL
    // from the portable md5 base hash (bit length via format('{:b}',r))
    // and runs the identical shared estimator text over the identical
    // exact BIGINT harmonic sum — so est_distinct, register_sum and
    // nonzero_registers hash-match exactly. merge_ok is literal 1 on the
    // oracle side and EARNED on the Spark side (slice-merge == whole,
    // the d11 property for the max monoid); within_bound both sides
    // derive as the same integer inequality vs the exact distinct count.
    Q("p08_distinct_sketch",
      (s, dir) => certifiedDistinct(Tables.load(s, dir, "lineitem"),
        col("l_orderkey")),
      Some(s"""WITH k AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
              |h AS (SELECT ${graft.functions.PortableHash.baseHashSql("k")} AS h FROM k),
              |b AS (SELECT CAST(h >> 23 AS INT) AS bucket, h & 8388607 AS r FROM h),
              |rr AS (SELECT bucket,
              |    CASE WHEN r = 0 THEN 24
              |         ELSE 24 - length(format('{:b}', r)) END AS rho
              |  FROM b),
              |regs AS (SELECT bucket, max(rho) AS m FROM rr GROUP BY bucket),
              |st AS (SELECT CAST(count(*) AS BIGINT) AS nonzero_registers,
              |    CAST(sum(m) AS BIGINT) AS register_sum,
              |    CAST(sum(1::BIGINT << (40 - m)) AS BIGINT) AS s_present
              |  FROM regs),
              |tot AS (SELECT nonzero_registers, register_sum,
              |    s_present + (512 - nonzero_registers) * (1::BIGINT << 40) AS s_total
              |  FROM st),
              |ex AS (SELECT count(DISTINCT k) AS n_exact FROM k),
              |est AS (SELECT n_exact, ${Profile.hllEstFormula(512)} AS est_distinct,
              |    nonzero_registers, register_sum
              |  FROM tot, ex)
              |SELECT n_exact, est_distinct, nonzero_registers, register_sum,
              |  1 AS merge_ok,
              |  CASE WHEN abs(est_distinct - n_exact) * 100 <= 15 * n_exact
              |       THEN 1 ELSE 0 END AS within_bound
              |FROM est""".stripMargin)),

    // ---- p12: corpus overlap from folded register tables ---------------
    // Overlap between two fingerprint corpora (the decontamination-sizing
    // question) via inclusion–exclusion over HLL registers: the union
    // sketch is a 512-row fold, never a rescan. The oracle re-derives all
    // three register tables and the estimate formula in integer SQL and
    // recomputes the exact intersection from scratch — every output is a
    // pinned integer, not a tolerance. The doc_id % 10 corpus split
    // (70% / 70%, 40% overlap) is non-degenerate at every SF, and at gate
    // scale all three estimates sit in the linear-counting arm the shared
    // formula's small-range correction exists for.
    Q("p12_sketch_overlap",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        sketchOverlap(
          docs.filter(pmod(col("doc_id"), lit(10)) < 7),
          docs.filter(pmod(col("doc_id"), lit(10)) >= 3),
          graft.functions.TextFns.fingerprint(col("text")))
      },
      Some {
        val norm = graft.functions.TextFns.normalizeSql("text")
        def side(x: String, f: String) =
          s"""k$x AS (SELECT md5($norm) AS k FROM documents WHERE $f),
             |h$x AS (SELECT ${graft.functions.PortableHash.baseHashSql("k")} AS h FROM k$x),
             |b$x AS (SELECT CAST(h >> 23 AS INT) AS bucket, h & 8388607 AS r FROM h$x),
             |r$x AS (SELECT bucket,
             |    CASE WHEN r = 0 THEN 24
             |         ELSE 24 - length(format('{:b}', r)) END AS rho FROM b$x),
             |g$x AS (SELECT bucket, max(rho) AS m FROM r$x GROUP BY bucket)""".stripMargin
        def est(x: String, src: String) =
          s"""s$x AS (SELECT CAST(count(*) AS BIGINT) AS nonzero_registers,
             |    CAST(sum(1::BIGINT << (40 - m)) AS BIGINT) AS s_present FROM $src),
             |t$x AS (SELECT nonzero_registers,
             |    s_present + (512 - nonzero_registers) * (1::BIGINT << 40) AS s_total
             |  FROM s$x),
             |e$x AS (SELECT ${Profile.hllEstFormula(512)} AS est$x FROM t$x)""".stripMargin
        s"""WITH ${side("a", "doc_id % 10 < 7")},
           |${side("b", "doc_id % 10 >= 3")},
           |gu AS (SELECT bucket, max(m) AS m
           |  FROM (SELECT * FROM ga UNION ALL SELECT * FROM gb) GROUP BY bucket),
           |${est("a", "ga")},
           |${est("b", "gb")},
           |${est("u", "gu")},
           |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_inter
           |  FROM (SELECT k FROM ka INTERSECT SELECT k FROM kb))
           |SELECT esta AS est_a, estb AS est_b, estu AS est_union,
           |  greatest(esta + estb - estu, 0) AS est_inter, exact_inter,
           |  CASE WHEN abs(greatest(esta + estb - estu, 0) - exact_inter) * 4 <= estu
           |       THEN 1 ELSE 0 END AS within_bound
           |FROM ea, eb, eu, ex""".stripMargin
      }),

    // ---- p13: robust outliers (median/MAD, exact integer cents) --------
    // The robust companion to p06's moment stats: heavy tails and corrupt
    // rows move mean/stddev arbitrarily but not median/MAD. Runs on the
    // event stream's value column per event type — the one fixture
    // distribution with real tails (≈11% of rows beyond 3×MAD; the
    // uniform TPC-H price columns have none, which would leave the
    // certification column identically zero). The oracle formulates both
    // medians with quantile_disc (DuckDB's native lower median) while the
    // Spark side derives them from ranged two-pass ranks — different
    // algorithms, matching integers.
    Q("p13_mad_outliers",
      (s, dir) => madOutliers(Tables.load(s, dir, "events"),
        "event_type", "value"),
      Some("""WITH c AS (SELECT event_type AS g,
             |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
             |m AS (SELECT g, CAST(quantile_disc(v, 0.5) AS BIGINT) AS med
             |  FROM c GROUP BY g),
             |d AS (SELECT c.g, c.v, m.med, abs(c.v - m.med) AS dev
             |  FROM c JOIN m USING (g)),
             |md AS (SELECT g, CAST(quantile_disc(dev, 0.5) AS BIGINT) AS mad
             |  FROM d GROUP BY g)
             |SELECT d.g AS event_type, CAST(count(*) AS BIGINT) AS n,
             |  min(d.med) AS med_cents, min(md.mad) AS mad_cents,
             |  CAST(sum(CASE WHEN d.dev > 3 * md.mad THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_outliers
             |FROM d JOIN md USING (g)
             |GROUP BY d.g ORDER BY d.g""".stripMargin)),

    // ---- p14: per-group distinct-count sketch (grouped HLL) ------------
    // Distinct users per event type from groups × 512 registers — the
    // grouped p08, sitting in the estimator's linear-counting arm at this
    // group size (~148 keys per type). The oracle rebuilds the grouped
    // registers and the shared formula in integer SQL; within_bound is
    // certified per group against the exact distinct count.
    Q("p14_grouped_distinct",
      (s, dir) => groupedDistinctSketch(
        Tables.load(s, dir, "events"), "event_type", col("user_id")),
      Some(s"""WITH kk AS (SELECT event_type AS g,
             |    CAST(user_id AS VARCHAR) AS k FROM events),
             |h AS (SELECT g, ${graft.functions.PortableHash.baseHashSql("k")} AS h FROM kk),
             |b AS (SELECT g, CAST(h >> 23 AS INT) AS bucket, h & 8388607 AS r FROM h),
             |rr AS (SELECT g, bucket,
             |    CASE WHEN r = 0 THEN 24
             |         ELSE 24 - length(format('{:b}', r)) END AS rho FROM b),
             |regs AS (SELECT g, bucket, max(rho) AS m FROM rr GROUP BY g, bucket),
             |st AS (SELECT g, CAST(count(*) AS BIGINT) AS nonzero_registers,
             |    CAST(sum(1::BIGINT << (40 - m)) AS BIGINT) AS s_present
             |  FROM regs GROUP BY g),
             |tot AS (SELECT g, nonzero_registers,
             |    s_present + (512 - nonzero_registers) * (1::BIGINT << 40) AS s_total
             |  FROM st),
             |ex AS (SELECT g, CAST(count(DISTINCT k) AS BIGINT) AS n_exact
             |  FROM kk GROUP BY g),
             |est AS (SELECT tot.g, n_exact, ${Profile.hllEstFormula(512)} AS est_distinct,
             |    nonzero_registers
             |  FROM tot JOIN ex ON tot.g = ex.g)
             |SELECT g AS event_type, n_exact, est_distinct, nonzero_registers,
             |  CASE WHEN abs(est_distinct - n_exact) * 100 <= 15 * n_exact
             |       THEN 1 ELSE 0 END AS within_bound
             |FROM est ORDER BY event_type""".stripMargin)),

    // ---- p15: declarative constraint audit (Deequ shape) ---------------
    // Six-constraint suite over orders, all evaluated in ONE scan+agg.
    // `status_in_of` is a DELIBERATELY violated expectation (orders also
    // carries status 'P'): the audit must report failures, not just
    // confirm health. Thresholds/metrics in exact integer basis points.
    Q("p15_constraint_audit",
      (s, dir) => constraintAudit(Tables.load(s, dir, "orders"), Seq(
        Constraint.complete("complete_custkey", col("o_custkey")),
        Constraint.unique("unique_orderkey", col("o_orderkey")),
        Constraint.satisfies("positive_totalprice", col("o_totalprice") > 0),
        Constraint.satisfies("status_in_of",
          col("o_orderstatus").isin("O", "F")),
        Constraint.satisfies("priority_known", col("o_orderpriority").isin(
          "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
        Constraint.satisfies("date_before_2001",
          col("o_orderdate") < to_timestamp(lit("2001-01-01")), 9000))), {
        def row(name: String, numer: String, thresh: Long) =
          s"""SELECT '$name' AS "constraint",
             |  CAST(CASE WHEN count(*) = 0 THEN 10000
             |       ELSE 10000 * ($numer) // count(*) END AS BIGINT) AS metric_bp,
             |  CAST($thresh AS BIGINT) AS threshold_bp
             |FROM orders""".stripMargin
        Some("SELECT \"constraint\", metric_bp, threshold_bp,\n" +
          "  CASE WHEN metric_bp >= threshold_bp THEN 1 ELSE 0 END AS passed\nFROM (\n" +
          Seq(
            row("complete_custkey", "count(o_custkey)", 10000),
            row("unique_orderkey", "count(DISTINCT o_orderkey)", 10000),
            row("positive_totalprice",
              "sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)", 10000),
            row("status_in_of",
              "sum(CASE WHEN o_orderstatus IN ('O','F') THEN 1 ELSE 0 END)", 10000),
            row("priority_known",
              "sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW') THEN 1 ELSE 0 END)",
              10000),
            row("date_before_2001",
              "sum(CASE WHEN o_orderdate < TIMESTAMP '2001-01-01' THEN 1 ELSE 0 END)",
              9000),
          ).mkString("\nUNION ALL\n") +
          "\n) ORDER BY \"constraint\"")
      }),
  )
}
