package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core of the engine: scans, projections, filters, the full join
  * surface, hash aggregation, sorts/top-k, set ops, window functions,
  * rollup/grouping sets, scalar string/date/math functions, subqueries.
  *
  * The reference (see SURVEY.md §2) hand-rolled all of this inside RDD
  * flatMap UDFs; here every query is a declarative DataFrame plan so Catalyst
  * does pushdown/pruning/join-selection and AQE handles skew at scale. Small
  * dimension tables (region/nation/supplier) are broadcast explicitly — at
  * 100 TB the fact tables (lineitem/orders/events) are the only ones that
  * should ever shuffle.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Money as DECIMAL — the fuzz-seed-116 lesson: `sum(price * (1 -
    * discount))` over DOUBLEs adds 4-decimal quantities in
    * engine-specific order, and a group whose EXACT sum ends in a
    * half-cent (…xx5) rounds to a different cent depending on which
    * side of the boundary the accumulated ulp error lands — a real
    * divergence DuckDB caught on a resampled corpus (q03, seed 116;
    * every revenue-style product-sum shared the latent bug). TPC-H
    * prices ARE decimals; casting to DECIMAL(18,2) before the multiply
    * makes every addend and the whole sum exact in both engines, the
    * half-up round then operates on the exact value, and the final
    * cast-to-double of an exact 2-decimal is identical everywhere.
    * Plain sums of 2-decimal columns (`sum(l_extendedprice)`) are NOT
    * affected: their exact sum is itself a 2-decimal number, 0.005 away
    * from any rounding boundary — far beyond any accumulated error. */
  private def dec2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(18,2)")
  private val one2 = lit(1).cast("decimal(18,2)")

  /** Distribution window functions (ntile / percent_rank / cume_dist
    * numerators) over a LOW-CARDINALITY grouping, without ever sorting a
    * whole group in one task.
    *
    * `Window.partitionBy(group)` puts each group's rows through ONE
    * WindowExec task — with a 3-value key that is a third of the corpus
    * per task at any scale, the classic window scale-killer. This
    * operator is the two-pass global-rank shape instead:
    *
    *  1. range-partition by (group ++ order) — each task holds a
    *     contiguous slice of ONE group's ordering (`parts` slices total,
    *     so max task load is n/parts regardless of group cardinality);
    *  2. count rows per (slice, group) — a map-side-combined aggregate of
    *     at most parts × |groups| rows — and turn it into per-group
    *     prefix-sum offsets with a window over that TINY table;
    *  3. broadcast the offsets back and add a per-slice `row_number`, so
    *     global rank = slice offset + local rank. The only per-row
    *     shuffles are the range partitioning and the (slice, group) local
    *     sort; both spread over `parts` tasks.
    *
    * Requires `order` to be a TOTAL order within each group (tie-broken,
    * as every cross-engine-deterministic query here already does): with
    * ties, row_number-based ranks would split what rank()/cume_dist()
    * merge. Emits the same exact-integer numerators as the window form —
    * `pr_num` = percent_rank·(n-1) = rank-1 and `cume_n` = cume_dist·n —
    * plus Spark-semantics `ntile` (first n mod k buckets take the extra
    * row), all from pure integer arithmetic on (rank, n). */
  def distributionRanks(df: DataFrame, groupCols: Seq[String],
      order: Seq[org.apache.spark.sql.Column], ntiles: Int,
      numParts: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts =
      if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val g = groupCols.map(col)
    // localCheckpoint is CORRECTNESS here, not caching: the slice table
    // is consumed twice (per-slice counts, then the rank join), and each
    // un-materialized reference would execute its own range exchange with
    // its own sampled boundaries (RangePartitioner seeds by rdd id, and
    // exchange reuse does not fire across the analyzer's self-join
    // re-aliasing — verified on the executed plan: two independent
    // rangepartitioning exchanges). At fixture scale the sampler sees
    // every row so both sides happen to agree; at partial-sampling scale
    // the __pid assignment diverges between the two passes and the
    // offsets silently describe the wrong slices. Materializing the
    // assignment once makes it a fact, not a coincidence — and a lost
    // checkpoint block fails loudly instead of recomputing different
    // boundaries.
    // Measured and left alone (r15 optimization): a graft.FanOut ahead of
    // the range exchange regressed every caller by 25–65% — the sampler
    // pass and range-shuffle write are too cheap per row to pay for an
    // extra exchange plus its AQE stage barrier.
    // lazy (r16): the range exchange materializes eagerly at toRdd time
    // either way (one sampling, one boundary set — the single-RDD fact
    // above is the checkpoint itself, not its eagerness), so the first
    // consumer's job populates the cache and the separate
    // materialization job is gone.
    val ranged = df.repartitionByRange(parts, (g ++ order): _*)
      .withColumn("__pid", spark_partition_id()).localCheckpoint(false)
    val counts = ranged.groupBy(col("__pid") +: g: _*)
      .agg(count(lit(1)).as("__c"))
    // with no group columns the offsets window is deliberately GLOBAL
    // over the bounded `parts`-row counts table (WindowExec's scale
    // warning for it is logger-silenced in GraftSession — a constant
    // partition key gets constant-folded out of the spec)
    val perGroup = Window.partitionBy(g: _*)
    val offsets = counts.select(col("__pid") +: g :+
      coalesce(sum(col("__c")).over(perGroup.orderBy(col("__pid"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("__off") :+
      sum(col("__c")).over(perGroup).as("__n"): _*)
    val localW = Window.partitionBy(col("__pid") +: g: _*).orderBy(order: _*)
    // Integer division on longs: subtracting the remainder first makes the
    // double division exact for any count below 2^53 rows per group.
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    // Spark/standard ntile from (rank, n): bucketSize = n div k with the
    // first n % k buckets one larger; cutoff is where the larger buckets
    // end. When n < k, cutoff = n so the zero-size branch is unreachable.
    val r = col("__r")
    val bs = idiv(col("__n"), lit(ntiles.toLong))
    val rem = col("__n") % ntiles
    val cutoff = rem * (bs + 1)
    val tile = when(r <= cutoff, idiv(r - 1, bs + 1) + 1)
      .otherwise(rem + idiv(r - cutoff - 1, bs) + 1)
    ranged.join(broadcast(offsets), "__pid" +: groupCols)
      .withColumn("__r", col("__off") + row_number().over(localW))
      .withColumn("octile", tile.cast("int"))
      .withColumn("pr_num", (r - 1).cast("long"))
      .withColumn("cume_n", r.cast("long"))
      .drop("__pid", "__off", "__n", "__r")
  }

  val queries: Seq[Q] = Seq(

    // ---- q01: full-table hash aggregation (TPC-H Q1 shape) -------------
    // Map-side partial agg → final agg: one shuffle of (flag,status) groups
    // only, never of rows. Scales linearly with input at any SF.
    Q("q01_agg",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(dec2(col("l_extendedprice")) * (one2 - dec2(col("l_discount")))), 2)
            .cast("double").as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          // exact-decimal numerator, then ONE double division — the avg
          // sibling of the dec2 sums (sum-of-doubles ulps could straddle
          // a 4dp half boundary)
          round(sum(dec2(col("l_discount"))).cast("double") / count(lit(1)), 4)
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
             |    AS sum_disc_price,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             |    / count(*), 4) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- q02: filter + projection with parquet pushdown ----------------
    // Predicate and the 5-column projection reach the scan (PushedFilters /
    // ReadSchema); at 100 TB this reads a fraction of the row groups.
    Q("q02_filter_project",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 &&
          col("l_shipdate") >= lit("1999-01-01 00:00:00").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"), round(col("l_extendedprice"), 2).as("price"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
             |  round(l_extendedprice, 2) AS price
             |FROM lineitem
             |WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- q03: 3-way join + agg + top-k (TPC-H Q3 shape) ----------------
    // customer is small relative to the facts → broadcast; orders⋈lineitem
    // is the one real shuffle, on the join key both sides.
    Q("q03_join_agg",
      (s, dir) => {
        val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .groupBy(col("l_orderkey"))
          .agg(round(sum(dec2(col("l_extendedprice")) * (one2 - dec2(col("l_discount")))), 2)
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY l_orderkey
             |ORDER BY revenue DESC, l_orderkey
             |LIMIT 10""".stripMargin)),

    // ---- q04: broadcast dimension join -------------------------------
    Q("q04_broadcast_join",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val nat = t(s, dir, "nation")
        val reg = t(s, dir, "region")
        cust.join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
          .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_customers"),
            round(sum(col("c_acctbal")), 2).as("total_acctbal"))
          .orderBy(col("r_name"))
      },
      Some("""SELECT r_name, count(*) AS n_customers,
             |  round(sum(c_acctbal), 2) AS total_acctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name
             |ORDER BY r_name""".stripMargin)),

    // ---- q05: 6-table join (TPC-H Q5 shape) ---------------------------
    // Fact-to-fact (orders⋈lineitem) shuffles once on the shared key; all
    // dimensions broadcast. Catalyst reorders the dimension joins freely.
    Q("q05_multi_join",
      (s, dir) => {
        val cust = t(s, dir, "customer"); val ord = t(s, dir, "orders")
        val li = t(s, dir, "lineitem"); val sup = t(s, dir, "supplier")
        val nat = t(s, dir, "nation"); val reg = t(s, dir, "region")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
          .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
          .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(dec2(col("l_extendedprice")) * (one2 - dec2(col("l_discount")))), 2)
            .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin)),

    // ---- q06: conditional aggregate, single-row result (TPC-H Q6) ------
    Q("q06_cond_agg",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount"))), 2)
          .cast("double").as("promo_revenue"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |    * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS promo_revenue,
             |  count(*) AS n_rows
             |FROM lineitem
             |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // ---- q07: global top-k (TakeOrderedAndProject, no full sort) -------
    Q("q07_topk",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("total"))
        .orderBy(col("total").desc, col("o_orderkey"))
        .limit(15),
      Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
             |FROM orders
             |ORDER BY total DESC, o_orderkey
             |LIMIT 15""".stripMargin)),

    // ---- q08: distinct (hash agg on all columns) ----------------------
    Q("q08_distinct",
      (s, dir) => t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_nationkey"))
        .distinct()
        .orderBy(col("c_mktsegment"), col("c_nationkey")),
      Some("""SELECT DISTINCT c_mktsegment, c_nationkey
             |FROM customer
             |ORDER BY c_mktsegment, c_nationkey""".stripMargin)),

    // ---- q09: set operations (INTERSECT / EXCEPT) ---------------------
    Q("q09_setops",
      (s, dir) => {
        val ord = t(s, dir, "orders")
        val open = ord.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        val fin = ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        val part = ord.filter(col("o_orderstatus") === "P").select(col("o_custkey"))
        open.intersect(fin).except(part).orderBy(col("o_custkey"))
      },
      Some("""(SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             | INTERSECT
             | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
             |ORDER BY o_custkey""".stripMargin)),

    // ---- q10: window function — top-3 per group -----------------------
    Q("q10_window_topn",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("c_nationkey"), col("rn"), col("c_custkey"),
            round(col("c_acctbal"), 2).as("acctbal"))
          .orderBy(col("c_nationkey"), col("rn"))
      },
      Some("""SELECT c_nationkey, rn, c_custkey, round(c_acctbal, 2) AS acctbal
             |FROM (
             |  SELECT c_nationkey, c_custkey, c_acctbal,
             |    row_number() OVER (PARTITION BY c_nationkey
             |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
             |  FROM customer) x
             |WHERE rn <= 3
             |ORDER BY c_nationkey, rn""".stripMargin)),

    // ---- q11: rollup (grouping sets) ----------------------------------
    Q("q11_rollup",
      (s, dir) => t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("total"))
        .orderBy(col("status"), col("priority")),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders
             |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    // ---- q12: left-semi join (EXISTS) ---------------------------------
    Q("q12_semi_join",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 150000)
          .select(col("o_custkey"))
        cust.join(big, cust("c_custkey") === big("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- q13: left-anti join (NOT EXISTS) -----------------------------
    Q("q13_anti_join",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val urgent = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // ---- q14: scalar string/math function surface ---------------------
    Q("q14_scalar_fns",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          upper(substring(col("p_name"), 1, 10)).as("uname"),
          length(col("p_name")).as("name_len"),
          round(col("p_retailprice") * 1.1, 2).as("adj_price"),
          (col("p_size") % 7).as("size_mod"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  upper(substr(p_name, 1, 10)) AS uname,
             |  length(p_name) AS name_len,
             |  round(p_retailprice * 1.1, 2) AS adj_price,
             |  p_size % 7 AS size_mod,
             |  concat_ws('|', p_brand, p_type) AS brand_type
             |FROM part
             |ORDER BY p_partkey""".stripMargin)),

    // ---- q15: date/time functions -------------------------------------
    Q("q15_datetime",
      (s, dir) => t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("yr"), col("mo")),
      Some("""SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             |  count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders
             |GROUP BY year(o_orderdate), month(o_orderdate)
             |ORDER BY yr, mo""".stripMargin)),

    // ---- q16: HAVING ---------------------------------------------------
    Q("q16_having",
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 5)
        .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey, count(*) AS n_orders
             |FROM orders
             |GROUP BY o_custkey
             |HAVING count(*) >= 5
             |ORDER BY o_custkey""".stripMargin)),

    // ---- q17: aggregate subquery join (TPC-H Q17 shape) ----------------
    // The per-part average is a second aggregate over the same fact table;
    // Spark computes it once and joins — both sides shuffle on l_partkey.
    Q("q17_subquery_avg",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val avgq = li.groupBy(col("l_partkey").as("ap_partkey"))
          .agg((avg(col("l_quantity")) * 0.5).as("half_avg"))
        li.join(avgq, li("l_partkey") === avgq("ap_partkey"))
          .filter(col("l_quantity") < col("half_avg"))
          .agg(round(sum(col("l_extendedprice")), 2).as("small_lot_rev"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT round(sum(l_extendedprice), 2) AS small_lot_rev,
             |  count(*) AS n_rows
             |FROM lineitem l
             |JOIN (SELECT l_partkey AS ap_partkey, avg(l_quantity) * 0.5 AS half_avg
             |      FROM lineitem GROUP BY l_partkey) a
             |  ON l.l_partkey = a.ap_partkey
             |WHERE l.l_quantity < a.half_avg""".stripMargin)),

    // ---- q18: exact distinct counts ------------------------------------
    Q("q18_count_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_suppkey) AS n_supp,
             |  count(DISTINCT l_partkey) AS n_part,
             |  count(DISTINCT l_orderkey) AS n_orders
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---- q19: CASE WHEN conditional aggregation ------------------------
    Q("q19_case_when",
      (s, dir) => t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
          round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)), 2).as("purchase_value"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id")),
      // CASTs: DuckDB's sum over ints yields HUGEINT; BIGINT matches Spark.
      Some("""SELECT user_id,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
             |  round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2) AS purchase_value,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
             |  count(*) AS n_events
             |FROM events
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // ---- q20: UNION ALL across heterogeneous sources -------------------
    Q("q20_union_all",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .select(lit("customer").as("kind"), col("c_acctbal").as("acctbal"))
        val sup = t(s, dir, "supplier")
          .select(lit("supplier").as("kind"), col("s_acctbal").as("acctbal"))
        cust.unionAll(sup)
          .groupBy(col("kind"))
          .agg(count(lit(1)).as("n"), round(sum(col("acctbal")), 2).as("total_bal"))
          .orderBy(col("kind"))
      },
      Some("""SELECT kind, count(*) AS n, round(sum(acctbal), 2) AS total_bal
             |FROM (SELECT 'customer' AS kind, c_acctbal AS acctbal FROM customer
             |      UNION ALL
             |      SELECT 'supplier' AS kind, s_acctbal AS acctbal FROM supplier) u
             |GROUP BY kind
             |ORDER BY kind""".stripMargin)),

    // ---- q21: running window aggregates (frame-based) ------------------
    Q("q21_window_running",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .filter(col("o_custkey") <= 20)
          .select(col("o_custkey"), col("o_orderkey"),
            round(sum(col("o_totalprice")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_total"),
            round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_total"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |        ORDER BY o_orderdate, o_orderkey
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
             |  round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
             |        ORDER BY o_orderdate, o_orderkey), 2) AS prev_total
             |FROM orders
             |WHERE o_custkey <= 20
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- q22: full outer join ------------------------------------------
    Q("q22_outer_join",
      (s, dir) => {
        val bySupp = t(s, dir, "lineitem").groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("n_items"))
        val sup = t(s, dir, "supplier")
        sup.join(bySupp, sup("s_suppkey") === bySupp("l_suppkey"), "full_outer")
          .select(coalesce(col("s_suppkey"), col("l_suppkey")).as("suppkey"),
            col("s_name"), coalesce(col("n_items"), lit(0L)).as("n_items"))
          .orderBy(col("suppkey"))
      },
      Some("""SELECT coalesce(s_suppkey, l_suppkey) AS suppkey, s_name,
             |  coalesce(n_items, 0) AS n_items
             |FROM supplier
             |FULL OUTER JOIN (SELECT l_suppkey, count(*) AS n_items
             |                 FROM lineitem GROUP BY l_suppkey) x
             |  ON s_suppkey = l_suppkey
             |ORDER BY suppkey""".stripMargin)),

    // ---- q23: CUBE (all grouping-set combinations) ---------------------
    Q("q23_cube",
      (s, dir) => t(s, dir, "customer")
        .cube(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("c_acctbal")), 2).as("total_bal"))
        .select(coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
          coalesce(col("c_nationkey"), lit(-1)).as("nationkey"),
          col("n"), col("total_bal"))
        .orderBy(col("segment"), col("nationkey")),
      Some("""SELECT coalesce(c_mktsegment, 'ALL') AS segment,
             |  coalesce(c_nationkey, -1) AS nationkey,
             |  count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
             |FROM customer
             |GROUP BY CUBE (c_mktsegment, c_nationkey)
             |ORDER BY segment, nationkey""".stripMargin)),

    // ---- q24: pivot (event-type counts per user) -----------------------
    Q("q24_pivot",
      (s, dir) => t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
             |FROM events
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // ---- q25: approximate distinct (HLL sketch). Raw HLL estimates are
    // engine-specific, so the checked output is the exact count plus a
    // derived invariant the oracle can assert: the rsd-0.01 estimate lands
    // within 5% of exact (ApproxSpec additionally bounds the error curve).
    // PLAN NOTE: never put countDistinct and approx_count_distinct in the
    // SAME aggregate — the distinct rewrite pushes the HLL's partial into
    // the per-(key, distinct-value) pre-aggregation, materializing the
    // 1,640-field sketch buffer once per DISTINCT VALUE (~1.5M × 13 KB of
    // aggregation state here; measured 6.5 s). HLL is duplicate-
    // insensitive, so aggregating it over the distinct stream is
    // register-identical and keeps sketch state at |groups|: 0.33 s, 20×.
    Q("q25_approx_distinct",
      // measured and left alone (r15): a keyed fan-out below the distinct
      // regressed 44% — the dedup hash insert is too cheap per row to pay
      // for shuffling raw rows instead of partial-distinct output
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey")).distinct()
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx"),
          count(lit(1)).as("exact_orders"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("approx") - col("exact_orders")) <=
            col("exact_orders") * lit(0.05)).cast("int").as("within_tol"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
             |  1 AS within_tol
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---- q26: exact interpolated percentiles per group -----------------
    // DuckDB `quantile_cont`'s definition (linear interpolation at
    // p·(n−1)), computed as a VALUE-DISTRIBUTION aggregate — q30's
    // machinery generalized from the median to arbitrary p (r13 verdict
    // #3): the old exact-`Percentile` arms materialized every group's
    // full value list in one ObjectHashAggregate task (~200k values/group
    // at sf0.1, linear in data — OOM-class at the 100 TB design point).
    // Both columns are bounded-domain (l_quantity integers 1–50,
    // l_extendedprice 2-decimal cents), so groupBy (flag, scaled-integer
    // value) counts + cumulative ranks pick the two bracketing order
    // statistics with state bounded by the DISTINCT value domain, never
    // the group's row count. With h = p·(n−1) written as hnum/pDen, the
    // bracketing 1-indexed ranks are ⌊h⌋+1 and ⌈h⌉+1 and the interpolated
    // value is (v_lo·(pDen−m) + v_hi·m) / (pDen·scale) with m = hnum mod
    // pDen — all exact integers until one final double division, so the
    // emitted double is the correctly-rounded rational and 4dp rounding
    // agrees with quantile_cont's double interpolation (the true values
    // have ≤ 4 decimals, so the rounding boundary is never in play).
    // PlanSpec pins the exact Percentile aggregate out of the plan.
    Q("q26_percentile",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val li = t(s, dir, "lineitem")
        // per-(flag, value) counts → cumulative ranks → for each spec
        // (pNum/pDen, output name) the two bracketing order statistics
        def pctls(vExpr: org.apache.spark.sql.Column, scale: Int,
            specs: Seq[(Int, Int, String)]): DataFrame = {
          val cum = li
            .groupBy(col("l_returnflag"),
              round(vExpr * scale).cast("long").as("v"))
            .agg(count(lit(1)).as("cnt"))
            .withColumn("cum", sum(col("cnt")).over(Window
              .partitionBy(col("l_returnflag")).orderBy(col("v"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .withColumn("n", sum(col("cnt")).over(Window
              .partitionBy(col("l_returnflag"))))
          val aggs = specs.flatMap { case (pNum, pDen, out) =>
            val hnum = lit(pNum) * (col("n") - 1)
            val m = pmod(hnum, lit(pDen))
            val loRank = floor(hnum / lit(pDen)).cast("long") + 1
            val hiRank = loRank + when(m > 0, 1L).otherwise(0L)
            Seq(
              min(when(col("cum") >= loRank, col("v"))).as(s"__${out}_lo"),
              min(when(col("cum") >= hiRank, col("v"))).as(s"__${out}_hi"),
              max(m).as(s"__${out}_m")) // m is constant per group
          }
          val picked = cum.groupBy(col("l_returnflag"))
            .agg(aggs.head, aggs.tail: _*)
          picked.select(col("l_returnflag") +: specs.map {
            case (_, pDen, out) =>
              round((col(s"__${out}_lo") * (lit(pDen) - col(s"__${out}_m")) +
                col(s"__${out}_hi") * col(s"__${out}_m")).cast("double") /
                (pDen.toDouble * scale), 4).as(out)
          }: _*)
        }
        pctls(col("l_quantity"), 1, Seq((1, 2, "qty_p50"), (19, 20, "qty_p95")))
          .join(pctls(col("l_extendedprice"), 100, Seq((1, 2, "price_p50"))),
            "l_returnflag")
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50,
             |  round(quantile_cont(l_quantity, 0.95), 4) AS qty_p95,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---- q27: edit-distance self-join (fuzzy string matching) ----------
    // Same-brand part-name pairs within Levenshtein distance 12 — the
    // brand blocking bounds the quadratic pair space the way `lang` does
    // for d04; both engines implement classic DP Levenshtein, so the
    // distances are identical integers.
    Q("q27_levenshtein",
      (s, dir) => {
        val p = t(s, dir, "part").filter(col("p_partkey") < 200)
          .select(col("p_partkey"), col("p_brand"), col("p_name"))
        p.as("a").join(p.as("b"),
            col("a.p_brand") === col("b.p_brand") &&
              col("a.p_partkey") < col("b.p_partkey"))
          .select(col("a.p_partkey").as("k1"), col("b.p_partkey").as("k2"),
            levenshtein(col("a.p_name"), col("b.p_name")).as("dist"))
          .filter(col("dist") <= 12)
          .orderBy(col("k1"), col("k2"))
      },
      Some("""SELECT a.p_partkey AS k1, b.p_partkey AS k2,
             |  levenshtein(a.p_name, b.p_name) AS dist
             |FROM part a JOIN part b
             |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
             |WHERE a.p_partkey < 200 AND b.p_partkey < 200
             |  AND levenshtein(a.p_name, b.p_name) <= 12
             |ORDER BY k1, k2""".stripMargin)),

    // ---- q28: range join (activity within 7 days after each signup) ----
    // Equi key (user) + time-range predicate: Catalyst plans an equi-join
    // with the range as a post-join filter — hash/SMJ on the key, never a
    // nested-loop — which is the scale-correct shape for "activity within
    // N days of an anchor" joins (PlanSpec pins the plan).
    Q("q28_range_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val anchors = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("user_id"),
            unix_millis(col("ts")).as("a_ms"))
        val acts = ev.select(col("user_id").as("u2"),
          unix_millis(col("ts")).as("e_ms"))
        anchors.join(acts,
            col("user_id") === col("u2") &&
              col("e_ms") > col("a_ms") &&
              col("e_ms") <= col("a_ms") + lit(7L * 86400000L))
          .groupBy(col("signup_id"))
          .agg(count(lit(1)).as("n_events"))
          .orderBy(col("signup_id"))
      },
      Some("""SELECT a.event_id AS signup_id, CAST(count(*) AS BIGINT) AS n_events
             |FROM events a JOIN events e
             |  ON a.user_id = e.user_id
             |  AND epoch_ms(e.ts) > epoch_ms(a.ts)
             |  AND epoch_ms(e.ts) <= epoch_ms(a.ts) + 604800000
             |WHERE a.event_type = 'signup'
             |GROUP BY a.event_id
             |ORDER BY signup_id""".stripMargin)),

    // ---- q30: approximate quantile sketch (percentile_approx) ----------
    // The sketch's raw value is engine-specific, so like q25 the checked
    // output is the exact quantile plus a derived invariant: the
    // accuracy-10000 estimate lands within 1% of exact (rank error is
    // bounded by n/accuracy, a ~60-rank slack at sf0.1).
    //
    // The exact arm is a VALUE-DISTRIBUTION aggregate (r12 verdict #1):
    // prices are 2-decimal, so per-row round(x*100) is an exact integer
    // and the exact median is computable with bounded memory — groupBy
    // (flag, cents) counts, cumulative pick of ranks ⌈n/2⌉ and ⌈(n+1)/2⌉
    // (q51's equi-depth machinery). State is bounded by the DISTINCT
    // cent domain, never the group's row count; the old
    // `percentile(...)` arm materialized every group's full value list
    // in one ObjectHashAggregate task (~200k values/group at sf0.1,
    // OOM-class at 100×). The ×2 half-cent emission keeps the even-n
    // midpoint an exact integer. The only remaining ObjectHashAggregate
    // is percentile_approx ITSELF — the operator under test — whose
    // state is the O(accuracy)-bounded sketch regardless of group size.
    // PlanSpec pins the exact Percentile aggregate out of the plan.
    Q("q30_approx_quantile",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val li = t(s, dir, "lineitem")
        val dist = li
          .groupBy(col("l_returnflag"),
            round(col("l_extendedprice") * 100).cast("long").as("cents"))
          .agg(count(lit(1)).as("cnt"))
        val cum = dist
          .withColumn("cum", sum(col("cnt")).over(Window
            .partitionBy(col("l_returnflag")).orderBy(col("cents"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n", sum(col("cnt")).over(Window
            .partitionBy(col("l_returnflag"))))
        // 1-indexed median ranks r1=(n+1) div 2, r2=(n+2) div 2; the
        // value at rank r is the smallest cents whose cumulative count
        // reaches r — halfcents = v(r1) + v(r2) is exact for odd and
        // even group sizes alike.
        val exact = cum.groupBy(col("l_returnflag"))
          .agg(
            min(when(col("cum") >= expr("(n + 1) DIV 2"), col("cents"))).as("lo"),
            min(when(col("cum") >= expr("(n + 2) DIV 2"), col("cents"))).as("hi"))
          .select(col("l_returnflag"),
            (col("lo") + col("hi")).cast("long").as("exact_p50_halfcents"),
            ((col("lo") + col("hi")).cast("double") / 200.0).as("exact"))
        val approx = li.groupBy(col("l_returnflag"))
          .agg(expr("percentile_approx(l_extendedprice, 0.5D, 10000)").as("approx"))
        exact.join(approx, "l_returnflag")
          .select(col("l_returnflag"), col("exact_p50_halfcents"),
            (abs(col("approx") - col("exact")) <=
              col("exact") * lit(0.01)).cast("int").as("within_tol"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  CAST(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) * 2 AS BIGINT)
             |    AS exact_p50_halfcents,
             |  1 AS within_tol
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---- q31: RANGE window frame (trailing time window per key) --------
    // A value-based frame — "events in the trailing hour", not "previous
    // N rows" — the window feature ROWS frames can't express when event
    // spacing is irregular. Pure integer epoch-ms bounds, portable.
    Q("q31_window_range",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ms"))
          .rangeBetween(-3600000L, 0L)
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
          .withColumn("n_trailing_1h", count(lit(1)).over(w))
          .orderBy(col("user_id"), col("ms"), col("event_id"))
      },
      Some("""SELECT user_id, event_id, epoch_ms(ts) AS ms,
             |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
             |                 RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
             |    AS n_trailing_1h
             |FROM events
             |ORDER BY user_id, ms, event_id""".stripMargin)),

    // ---- q32: GROUPING SETS (beyond rollup/cube) -----------------------
    // Arbitrary grouping-set combinations are SQL-only surface (the
    // DataFrame API stops at rollup/cube), so this query exercises the
    // engine's spark.sql interface over a registered view — grouping_id
    // disambiguates the (NULL-able) set each row belongs to.
    Q("q32_grouping_sets",
      (s, dir) => {
        t(s, dir, "events").createOrReplaceTempView("events_v")
        s.sql("""SELECT event_type, user_id % 5 AS user_bucket,
                |  CAST(grouping_id(event_type, user_id % 5) AS INT) AS gid,
                |  count(*) AS n,
                |  CAST(round(sum(value)) AS BIGINT) AS sum_value
                |FROM events_v
                |GROUP BY GROUPING SETS ((event_type), (user_id % 5), ())
                |ORDER BY gid, event_type, user_bucket""".stripMargin('|'))
      },
      Some("""SELECT event_type, user_id % 5 AS user_bucket,
             |  CAST(grouping(event_type, user_id % 5) AS INT) AS gid,
             |  count(*) AS n,
             |  CAST(round(sum(value)) AS BIGINT) AS sum_value
             |FROM events
             |GROUP BY GROUPING SETS ((event_type), (user_id % 5), ())
             |ORDER BY gid, event_type, user_bucket""".stripMargin)),

    // ---- q33: correlated scalar subquery (TPC-H Q2 shape) --------------
    // Cheapest line per part via a per-row correlated min — the shape
    // Catalyst decorrelates into an aggregate + self-join, so the plan is
    // two scans and a hash join, not a per-row probe (anything per-row
    // would be dead at 100 TB). Price compared raw (identical stored
    // doubles in both engines), emitted as exact integer cents.
    Q("q33_correlated_scalar",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT l_partkey, l_orderkey, l_linenumber,
                |  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
                |FROM lineitem_v l1
                |WHERE l_extendedprice = (SELECT min(l2.l_extendedprice)
                |                         FROM lineitem_v l2
                |                         WHERE l2.l_partkey = l1.l_partkey)
                |ORDER BY l_partkey, l_orderkey, l_linenumber""".stripMargin('|'))
      },
      Some("""SELECT l_partkey, l_orderkey, l_linenumber,
             |  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
             |FROM lineitem l1
             |WHERE l_extendedprice = (SELECT min(l2.l_extendedprice)
             |                         FROM lineitem l2
             |                         WHERE l2.l_partkey = l1.l_partkey)
             |ORDER BY l_partkey, l_orderkey, l_linenumber""".stripMargin)),

    // ---- q34: chained EXISTS / NOT EXISTS (TPC-H Q21 shape) ------------
    // Suppliers who are the SOLE returning supplier on a finished
    // multi-supplier order: one correlated EXISTS (another supplier
    // shipped in the order) and one correlated NOT EXISTS (no OTHER
    // supplier had a return). Both decorrelate to left-semi / left-anti
    // joins on l_orderkey — scale-safe equi-joins, no per-row probes.
    Q("q34_exists_chain",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        t(s, dir, "orders").createOrReplaceTempView("orders_v")
        t(s, dir, "supplier").createOrReplaceTempView("supplier_v")
        s.sql("""SELECT s_suppkey, s_name, count(*) AS n_lines
                |FROM supplier_v, lineitem_v l1, orders_v o
                |WHERE s_suppkey = l1.l_suppkey
                |  AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
                |  AND l1.l_returnflag = 'R'
                |  AND EXISTS (SELECT 1 FROM lineitem_v l2
                |              WHERE l2.l_orderkey = l1.l_orderkey
                |                AND l2.l_suppkey <> l1.l_suppkey)
                |  AND NOT EXISTS (SELECT 1 FROM lineitem_v l3
                |                  WHERE l3.l_orderkey = l1.l_orderkey
                |                    AND l3.l_suppkey <> l1.l_suppkey
                |                    AND l3.l_returnflag = 'R')
                |GROUP BY s_suppkey, s_name
                |ORDER BY s_suppkey""".stripMargin('|'))
      },
      Some("""SELECT s_suppkey, s_name, count(*) AS n_lines
             |FROM supplier, lineitem l1, orders o
             |WHERE s_suppkey = l1.l_suppkey
             |  AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
             |  AND l1.l_returnflag = 'R'
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_returnflag = 'R')
             |GROUP BY s_suppkey, s_name
             |ORDER BY s_suppkey""".stripMargin)),

    // ---- q35: LATERAL correlated subquery (per-row top-k) --------------
    // Top-2 customers per nation through a LATERAL subquery with its own
    // ORDER BY + LIMIT — the per-row table expression window functions
    // can't always replace (the inner query could join/aggregate freely).
    // Catalyst plans the decorrelated form (DomainJoin → window-equiv),
    // not a per-row re-execution; ties broken by custkey so both engines
    // pick identical rows.
    Q("q35_lateral_topk",
      (s, dir) => {
        t(s, dir, "nation").createOrReplaceTempView("nation_v")
        t(s, dir, "customer").createOrReplaceTempView("customer_v")
        s.sql("""SELECT n_name, c_custkey,
                |  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
                |FROM nation_v n, LATERAL (
                |  SELECT c_custkey, c_acctbal FROM customer_v c
                |  WHERE c.c_nationkey = n.n_nationkey
                |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
                |ORDER BY n_name, acctbal_cents DESC, c_custkey""".stripMargin('|'))
      },
      Some("""SELECT n_name, c_custkey,
             |  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
             |FROM nation n, LATERAL (
             |  SELECT c_custkey, c_acctbal FROM customer c
             |  WHERE c.c_nationkey = n.n_nationkey
             |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
             |ORDER BY n_name, acctbal_cents DESC, c_custkey""".stripMargin)),

    // ---- q36: distribution window functions ----------------------------
    // ntile / percent_rank / cume_dist over a per-flag price ordering —
    // the remaining window surface (ranking + running + RANGE frames are
    // q10/q21/q31). l_returnflag has THREE values, so the window form
    // `PARTITION BY l_returnflag` (still the oracle below) sorts a third
    // of the corpus in one task; the engine side instead runs
    // [[distributionRanks]] — range-partitioned two-pass global ranks —
    // which the oracle proves pointwise-equal to the window functions.
    // The two ratio functions are emitted as their exact integer
    // numerators — percent_rank·(n-1) = rank-1 and cume_dist·n =
    // rows-≤-current — because a round(ratio, 6dp) can land on a
    // representable halfway point where the engines' rounding disagrees
    // (the q30 lesson; integers can't). Ordering ties broken by
    // (orderkey, linenumber): the total order distributionRanks requires
    // and cross-engine determinism both need it.
    Q("q36_window_distribution",
      (s, dir) => distributionRanks(
          t(s, dir, "lineitem"),
          Seq("l_returnflag"),
          Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
          ntiles = 8)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("octile"), col("pr_num"), col("cume_n"))
        .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_returnflag, l_orderkey, l_linenumber,
             |  ntile(8) OVER w AS octile,
             |  CAST(round(percent_rank() OVER w * (count(*) OVER wp - 1)) AS BIGINT) AS pr_num,
             |  CAST(round(cume_dist() OVER w * count(*) OVER wp) AS BIGINT) AS cume_n
             |FROM lineitem
             |WINDOW w AS (PARTITION BY l_returnflag
             |             ORDER BY l_extendedprice, l_orderkey, l_linenumber),
             |  wp AS (PARTITION BY l_returnflag)
             |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin)),

    // ---- q29: JSON extraction over a string column ---------------------
    // Schema-on-read for semi-structured payloads (`events.props` carries
    // JSON): `get_json_object` is a codegen'd path expression — the scan
    // stays columnar and the extraction never leaves the executor.
    Q("q29_json_extract",
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
             |FROM events
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // ---- q37: UNPIVOT (wide measures -> long) --------------------------
    // Dataset.unpivot keeps the melt inside one narrow projection (each
    // input row emits its 3 measure rows in place — no shuffle until the
    // aggregate), so at 100 TB the cost is the aggregation, not the
    // reshape. Totals are exact integer cents (the p04 trick), so the
    // melted sums hash-match across engines.
    Q("q37_unpivot",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"), col("l_discount"), col("l_tax"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "value")
        .groupBy(col("l_returnflag"), col("measure"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("total_cents"))
        .orderBy(col("l_returnflag"), col("measure")),
      Some("""WITH u AS (
             |  UNPIVOT (SELECT l_returnflag, l_quantity, l_discount, l_tax FROM lineitem)
             |  ON l_quantity, l_discount, l_tax INTO NAME measure VALUE value)
             |SELECT l_returnflag, measure,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
             |FROM u
             |GROUP BY l_returnflag, measure
             |ORDER BY l_returnflag, measure""".stripMargin)),

    // ---- q38: array higher-order functions -----------------------------
    // filter/transform/aggregate over the embedding arrays — per-row
    // lambda pipelines that stay inside whole-stage codegen (no UDF). The
    // L1 mass is integerized per element (round(|x|·10⁴) as BIGINT) so
    // the fold is order-independent and exact across engines; only the
    // max — a comparison, no accumulation — stays float.
    Q("q38_array_hof",
      (s, dir) => {
        val e = graft.functions.VectorFns.toDouble(col("embedding"))
        t(s, dir, "embeddings")
          .select(col("vec_id"),
            size(filter(e, x => x > 0)).cast("long").as("n_pos"),
            aggregate(transform(e, x => round(abs(x) * 10000).cast("long")),
              lit(0L), (acc, x) => acc + x).as("l1_e4"),
            round(array_max(e), 4).as("max_val"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
             |SELECT vec_id,
             |  CAST(len(list_filter(e, x -> x > 0)) AS BIGINT) AS n_pos,
             |  CAST(list_sum(list_transform(e, x -> CAST(round(abs(x) * 10000) AS BIGINT))) AS BIGINT) AS l1_e4,
             |  round(list_max(e), 4) AS max_val
             |FROM e
             |ORDER BY vec_id""".stripMargin)),

    // ---- q39: write-path round trip (partitioned parquet sink) ---------
    // The one registered query that exercises a SINK: project lineitem to
    // exact integer cents, write it partitioned by l_returnflag (a
    // directory per flag — the layout later reads prune on), read it
    // back, and aggregate. The oracle aggregates the SOURCE table, so a
    // hash match proves the write→read round trip is lossless, row- and
    // value-exact — putting sources/Formats inside the driver gate
    // instead of only FormatsSpec. The write lands under this process's
    // RunDirs tree with overwrite mode: re-runs (bench's warm runs)
    // measure a full rewrite, not an append.
    Q("q39_write_roundtrip",
      (s, dir) => {
        val src = t(s, dir, "lineitem").select(col("l_returnflag"),
          col("l_orderkey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        val out = graft.RunDirs.dir("q39_roundtrip").toString
        graft.sources.Formats.writeParquet(src, out,
          partitionBy = Seq("l_returnflag"))
        // explicit schema: a zero-row partitioned write leaves no files
        // to infer from, and the read-back schema is known anyway
        s.read.schema(src.schema).parquet(out)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("total_cents"),
            countDistinct(col("l_orderkey")).as("n_orders"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
             |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---- q40: salted skew join -----------------------------------------
    // The hot-key JOIN mitigation as a driver-gated query (p04 covers the
    // aggregation side): events (hot user_id, the key p03 profiles) join
    // customer sharded over 8 deterministic event_id salts, the customer
    // side replicated in-row per salt. Salting must be INVISIBLE — the
    // oracle is the plain join. Summed value is integer cents (order-
    // independent); PlanSpec pins the executed shape (salt-replicating
    // Generate on the small side, join keys including the salt, no
    // broadcast of the salted side).
    Q("q40_salted_join",
      (s, dir) => graft.functions.Skew.saltedJoin(
          Tables.load(s, dir, "events")
            .select(col("user_id"), col("event_id"),
              round(col("value") * 100).cast("long").as("cents")),
          Tables.load(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment")),
          bigKey = col("user_id"), smallKey = col("c_custkey"),
          unique = col("event_id"), salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("value_cents"))
        .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
             |FROM events JOIN customer ON user_id = c_custkey
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // ---- q42: CDC upsert (apply a changes batch to a base table) -------
    // The merge shape every dimension table at 100 TB lives by: updated
    // rows replace their base versions, new rows append — as a broadcast
    // LEFT ANTI join (base never shuffles; the changes batch is the small
    // side by construction) plus a union. Updates = every 7th customer
    // with a re-stated balance; inserts = suppliers re-keyed into the
    // customer id space. Oracle is the NOT IN + UNION ALL formulation.
    // ---- q44: keep-latest compaction (CDC log -> current state) --------
    // Latest event per user as ONE max-of-struct aggregation — the
    // bounded-memory form of the row_number()=1 window (d01's lesson for
    // the compaction pass: a hot key costs partial-max merges, never a
    // buffered partition). The oracle deliberately IS the window
    // formulation, so the green row machine-checks agg == window. Struct
    // ordering is lexicographic (ms, event_id, cents): event_id is unique
    // per ms so the tie-break is total.
    Q("q44_keep_latest",
      (s, dir) => t(s, dir, "events")
        .select(col("user_id"),
          struct(unix_millis(col("ts")).as("ms"), col("event_id"),
            round(col("value") * 100).cast("long").as("value_cents")).as("ev"))
        .groupBy(col("user_id")).agg(max(col("ev")).as("last"))
        .select(col("user_id"), col("last.ms").as("ms"),
          col("last.event_id").as("event_id"),
          col("last.value_cents").as("value_cents"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, ms, event_id, value_cents
             |FROM (SELECT user_id, epoch_ms(ts) AS ms, event_id,
             |        CAST(round(value * 100) AS BIGINT) AS value_cents,
             |        row_number() OVER (PARTITION BY user_id
             |          ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
             |      FROM events)
             |WHERE rn = 1
             |ORDER BY user_id""".stripMargin)),

    Q("q42_upsert",
      (s, dir) => {
        val base = t(s, dir, "customer").select(col("c_custkey"),
          col("c_name"), round(col("c_acctbal") * 100).cast("long").as("acct_cents"))
        val updates = base.filter(pmod(col("c_custkey"), lit(7)) === 0)
          .select(col("c_custkey"), col("c_name"),
            (col("acct_cents") + 10000L).as("acct_cents"))
        val inserts = t(s, dir, "supplier").select(
          (col("s_suppkey") + 900000L).as("c_custkey"), col("s_name").as("c_name"),
          round(col("s_acctbal") * 100).cast("long").as("acct_cents"))
        val changes = updates.unionByName(inserts)
        base.join(broadcast(changes), Seq("c_custkey"), "left_anti")
          .unionByName(changes)
          .orderBy(col("c_custkey"))
      },
      Some("""WITH base AS (SELECT c_custkey, c_name,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS acct_cents FROM customer),
             |changes AS (
             |  SELECT c_custkey, c_name, acct_cents + 10000 AS acct_cents
             |  FROM base WHERE c_custkey % 7 = 0
             |  UNION ALL
             |  SELECT s_suppkey + 900000, s_name,
             |    CAST(round(s_acctbal * 100) AS BIGINT)
             |  FROM supplier)
             |SELECT * FROM (
             |  SELECT * FROM base
             |  WHERE c_custkey NOT IN (SELECT c_custkey FROM changes)
             |  UNION ALL SELECT * FROM changes)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- q43: SCD Type-2 dimension build -------------------------------
    // Slowly-changing-dimension history from a change stream: each
    // customer's orders (ordered by date, key-tie-broken) become attribute
    // versions with [valid_from, valid_to) intervals — valid_to = next
    // version's start, NULL while current. One window over o_custkey
    // (high-cardinality partition: ~1.5k customers at sf0.01, each a few
    // rows — per-task sort is bounded by a customer's own history, the
    // shape that survives 100×). The interval derivation is lead(), not a
    // self-join — one shuffle, no join explosion.
    Q("q43_scd2",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            round(col("o_totalprice"), 2).as("price"))
          .withColumn("version", row_number().over(w))
          .withColumn("valid_from", col("o_orderdate"))
          .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
          .withColumn("is_current", col("valid_to").isNull.cast("int"))
          .select(col("o_custkey"), col("version"), col("valid_from"),
            col("valid_to"), col("is_current"), col("price"))
          .orderBy(col("o_custkey"), col("version"))
      },
      Some("""SELECT o_custkey,
             |  CAST(row_number() OVER w AS INT) AS version,
             |  o_orderdate AS valid_from,
             |  lead(o_orderdate, 1) OVER w AS valid_to,
             |  CASE WHEN lead(o_orderdate, 1) OVER w IS NULL
             |       THEN 1 ELSE 0 END AS is_current,
             |  round(o_totalprice, 2) AS price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, version""".stripMargin)),

    // ---- q41: bucketed co-located join ---------------------------------
    // The exchange-elision layout inside the correctness gate (q39 put
    // plain writes there; FormatsSpec alone pinned bucketing until now):
    // both fact tables are written bucketed+sorted on the join key, so
    // the subsequent join reads co-located buckets and the executed plan
    // carries NO shuffle on either side (PlanSpec pins it). This is the
    // layout decision that turns every repeated fact-to-fact join at
    // 100 TB from a shuffle into a local merge. The oracle is the same
    // join over the source tables — bucketing must be result-invisible.
    Q("q41_bucketed_join",
      (s, dir) => {
        val base = graft.RunDirs.dir("q41").toString
        val li = t(s, dir, "lineitem").select(col("l_orderkey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        val ord = t(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderpriority"))
        graft.sources.Formats.writeBucketedAt(li, s"$base/li", "q41_li",
          Seq("l_orderkey"), buckets = 8)
        graft.sources.Formats.writeBucketedAt(ord, s"$base/ord", "q41_ord",
          Seq("o_orderkey"), buckets = 8)
        s.table("q41_li")
          .join(s.table("q41_ord"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ---- q45: retention cohort matrix ----------------------------------
    // The product-analytics staple: users bucketed by first-seen week
    // (epoch-aligned 7-day buckets — integer epoch math, so both engines
    // agree with no week-start/timezone convention), counted per
    // (cohort, offset) cell. ONE user-keyed shuffle computes BOTH the
    // cohort and the distinct active weeks (collect_set is bounded by
    // the corpus's week count, ~hundreds at any scale); the second
    // shuffle is over cohort×offset cells — negligible. The naive form
    // (activity matrix JOIN first-seen) shuffles the events table twice;
    // this one never joins.
    Q("q45_retention_cohorts",
      (s, dir) => t(s, dir, "events")
        .select(col("user_id"),
          expr("unix_millis(ts) div 604800000").as("week"))
        .groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"),
          collect_set(col("week")).as("weeks"))
        .select(col("cohort_week"), explode(col("weeks")).as("week"))
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset")),
      Some("""WITH act AS (SELECT DISTINCT user_id,
             |    epoch_ms(ts) // 604800000 AS week FROM events),
             |uw AS (SELECT user_id, min(week) AS cohort_week
             |       FROM act GROUP BY user_id)
             |SELECT cohort_week, week - cohort_week AS week_offset,
             |  CAST(count(*) AS BIGINT) AS n_users
             |FROM act JOIN uw USING (user_id)
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)),

    // ---- q46: item co-occurrence (co-purchase pairs) -------------------
    // "Frequently bought together": canonical item pairs sharing a buyer,
    // counted. The scale shape is g09's capped wedge on relational data:
    // ONE user-keyed shuffle builds each buyer's sorted distinct basket
    // (capped at 32 items, so a power-buyer costs O(cap²) not O(deg²) —
    // the cap is part of the registered semantics and the oracle
    // replicates it via row_number), then pairs generate IN-ROW from the
    // basket array and only the (i,j) count aggregation shuffles —
    // pair-space, not user×pair-space. No self-join of the events table.
    Q("q46_copurchase",
      (s, dir) => t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("int").as("item"))
        .groupBy(col("user_id"))
        .agg(slice(sort_array(collect_set(col("item"))), 1, 32).as("items"))
        .select(explode(col("items")).as("i"), col("items"))
        .select(col("i"),
          explode(filter(col("items"), x => x > col("i"))).as("j"))
        .groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n_users"))
        .filter(col("n_users") >= 2)
        .orderBy(col("i"), col("j")),
      Some("""WITH p AS (SELECT DISTINCT user_id,
             |    CAST(json_extract_string(props, '$.k') AS INT) AS item
             |  FROM events WHERE event_type = 'purchase'),
             |b AS (SELECT user_id, item,
             |    row_number() OVER (PARTITION BY user_id ORDER BY item) AS rn
             |  FROM p)
             |SELECT a.item AS i, c.item AS j, CAST(count(*) AS BIGINT) AS n_users
             |FROM b a JOIN b c ON a.user_id = c.user_id AND a.item < c.item
             |WHERE a.rn <= 32 AND c.rn <= 32
             |GROUP BY 1, 2
             |HAVING count(*) >= 2
             |ORDER BY 1, 2""".stripMargin)),

    // ---- q47: event-type transition matrix -----------------------------
    // First-order Markov transitions over each user's event sequence:
    // lead() on a per-user window (high-cardinality partition — a task
    // sorts one user's history, never a global sort), tie-broken by
    // event_id so the sequence is total and both engines see the same
    // successor. The (from, to) count aggregation is over |types|² cells.
    Q("q47_transitions",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             |FROM (SELECT event_type AS from_type,
             |        lead(event_type, 1) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS to_type
             |      FROM events) s
             |WHERE to_type IS NOT NULL
             |GROUP BY from_type, to_type
             |ORDER BY from_type, to_type""".stripMargin)),

    // ---- q48: temporal densification (gap-filled per-key hour grid) ----
    // Resampling for time-series consumers: every hour between each
    // user's first and last event, zero-filled where nothing happened.
    // The dense grid GENERATES IN-ROW from each key's span (sequence +
    // explode) — never a join against a materialized calendar table —
    // and the spans derive from the hourly counts (not a second scan of
    // events), so the count exchange is built once and reused. The
    // zero-fill join is equi-keyed on (user, hour). A key's cost is its
    // own span length; the corpus never re-shuffles.
    Q("q48_densify",
      (s, dir) => {
        val counts = t(s, dir, "events")
          .select(col("user_id"), expr("unix_millis(ts) div 3600000").as("hr"))
          .groupBy(col("user_id"), col("hr"))
          .agg(count(lit(1)).as("n"))
        val spans = counts.groupBy(col("user_id"))
          .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        spans
          .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hr"))
          .join(counts, Seq("user_id", "hr"), "left")
          .select(col("user_id"), col("hr"),
            coalesce(col("n"), lit(0L)).as("n"))
          .orderBy(col("user_id"), col("hr"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_ms(ts) // 3600000 AS hr FROM events),
             |c AS (SELECT user_id, hr, CAST(count(*) AS BIGINT) AS n
             |      FROM e GROUP BY 1, 2),
             |s AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1
             |      FROM c GROUP BY 1),
             |g AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hr FROM s)
             |SELECT g.user_id, g.hr, coalesce(c.n, 0) AS n
             |FROM g LEFT JOIN c ON g.user_id = c.user_id AND g.hr = c.hr
             |ORDER BY 1, 2""".stripMargin)),

    // ---- q49: percent-of-total contribution ----------------------------
    // Share of total revenue per market segment, in exact integer ppm
    // (the t12 DECIMAL(38,0)/HUGEINT idiom — no float division). The
    // ORACLE is the textbook sum() OVER () global-window form; the
    // registered plan computes the total as a scalar aggregate over the
    // (tiny) grouped result and broadcasts it back — at 100 TB the
    // global window is a single-task sort over every group, while the
    // broadcast costs one row. The green row machine-checks the
    // window==broadcast equivalence.
    Q("q49_share",
      (s, dir) => {
        val seg = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        val total = seg.agg(sum(col("cents")).as("t"))
        seg.crossJoin(broadcast(total))
          .select(col("c_mktsegment"), col("cents"),
            expr("""CAST(CAST(cents AS DECIMAL(38,0)) * 1000000
                    div CAST(t AS DECIMAL(38,0)) AS BIGINT)""").as("share_ppm"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""WITH seg AS (SELECT c_mktsegment,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY c_mktsegment)
             |SELECT c_mktsegment, cents,
             |  CAST(cents::HUGEINT * 1000000
             |       // sum(cents::HUGEINT) OVER () AS BIGINT) AS share_ppm
             |FROM seg
             |ORDER BY c_mktsegment""".stripMargin)),

    // ---- q50: daily churn (active on day d, absent on d+1) -------------
    // q45's single-shuffle machinery with the absence test done IN-ROW:
    // each user's active-day set is built once (bounded by the corpus's
    // day count), and "no activity tomorrow" is an array_contains probe
    // on that set — the textbook formulation is a self-ANTI-join of the
    // activity matrix on (user, day+1), a second full shuffle of the
    // events table. Day buckets (not weeks) so the fixture corpus — in
    // which every user is active every week — produces a discriminating
    // multi-row result. The final day counts everyone as churned (no d+1
    // data exists) — deterministic in both engines, and what a real
    // dashboard clips.
    Q("q50_churn",
      (s, dir) => t(s, dir, "events")
        .select(col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .groupBy(col("user_id"))
        .agg(collect_set(col("day")).as("days"))
        .select(explode(col("days")).as("day"), col("days"))
        .filter(!expr("array_contains(days, day + 1)"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("churned"))
        .orderBy(col("day")),
      Some("""WITH act AS (SELECT DISTINCT user_id,
             |    epoch_ms(ts) // 86400000 AS day FROM events)
             |SELECT a.day, CAST(count(*) AS BIGINT) AS churned
             |FROM act a LEFT JOIN act b
             |  ON a.user_id = b.user_id AND b.day = a.day + 1
             |WHERE b.user_id IS NULL
             |GROUP BY a.day
             |ORDER BY a.day""".stripMargin)),

    // ---- q51: equi-depth feature binning without a global sort ---------
    // The feature-engineering primitive behind quantile binning /
    // monotonic bucketing: 8 equal-population bins over a value column
    // with per-bin population and edges. The textbook form is a single
    // global ntile window — one task sorts the entire corpus (the q36
    // scale-killer). This runs on distributionRanks' two-pass shape
    // instead: range-partition, count per partition, broadcast prefix
    // offsets, rank locally — every task sorts only its range slice. The
    // oracle IS the single-window ntile, so the green row machine-checks
    // the rewrite lossless (bin aggregates are tie-invariant: boundary
    // ties swap identical values between adjacent bins). Integer cents in,
    // integer edges out — no float comparisons anywhere.
    Q("q51_equidepth_bins",
      (s, dir) => {
        val cents = t(s, dir, "lineitem")
          .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
        distributionRanks(cents, Seq.empty, Seq(col("v")), ntiles = 8)
          .groupBy(col("octile"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("v")).as("lo_cents"), max(col("v")).as("hi_cents"))
          .select(col("octile").cast("long").as("bin"),
            col("n_rows"), col("lo_cents"), col("hi_cents"))
          .orderBy(col("bin"))
      },
      Some("""WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
             |  FROM lineitem),
             |tl AS (SELECT v, ntile(8) OVER (ORDER BY v) AS bin FROM c)
             |SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
             |  min(v) AS lo_cents, max(v) AS hi_cents
             |FROM tl GROUP BY bin ORDER BY bin""".stripMargin)),

    // ---- q52: recency-decayed engagement score (exact dyadic EWMA) -----
    // Half-life-decayed per-user engagement: each event contributes
    // value * 2^-steps where steps counts newer events for that user —
    // the standard alpha = 1/2 exponential decay. Computed ENTIRELY in
    // integers: cents shifted left by (40 - steps), contributions below
    // 2^-40 of a cent truncated to zero — so there is no float-summation
    // order hazard and both engines produce the identical BIGINT (bounded:
    // <= 41 terms * 2000 cents * 2^40 < 2^58). The window partitions by
    // user_id (high cardinality) — one shuffle, no global sort; the decay
    // itself is per-row column math after the rank.
    Q("q52_decayed_score",
      (s, dir) => t(s, dir, "events")
        .select(col("user_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
          expr("row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) - 1")
            .as("steps"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("steps") <= 40,
              col("cents") * expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(40 - steps AS INT)) AS BIGINT)"))
            .otherwise(lit(0L))).as("score_scaled"))
        .orderBy(col("user_id")),
      Some("""WITH sdf AS (SELECT user_id,
             |    CAST(round(value * 100) AS BIGINT) AS cents,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts DESC, event_id DESC) - 1 AS steps
             |  FROM events)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CASE WHEN steps <= 40
             |      THEN cents * (CAST(1 AS BIGINT) << CAST(40 - steps AS INT))
             |      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS score_scaled
             |FROM sdf GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- q53: z-order addresses for 2-D data skipping ------------------
    // The lakehouse OPTIMIZE ZORDER primitive: bit-interleaved (Morton)
    // addresses over (l_partkey, l_suppkey), grouped by aligned z-quad.
    // Two certification columns are EARNED per bucket: rt_ok (the inverse
    // spread recovers both coordinates — the round trip that makes the
    // address faithful) and box_ok (every 4096-address quad is a tight
    // <= 64 x 64 box in the ORIGINAL dimensions — the locality property
    // file skipping depends on). ZOrderSpec measures the payoff: a 2-D
    // range predicate intersects a fraction of z-clustered files vs ALL
    // hash-layout files. Both engines evaluate the identical shared
    // magic-mask text over BIGINT &, |, <<.
    Q("q53_zorder",
      (s, dir) => {
        import graft.functions.ZOrder
        t(s, dir, "lineitem")
          .select(col("l_partkey").cast("long").as("x"),
            col("l_suppkey").cast("long").as("y"))
          .withColumn("z", ZOrder.z("x", "y"))
          .withColumn("rx", expr(ZOrder.unspreadSql("z")))
          .withColumn("ry", expr(ZOrder.unspreadSql("(z >> 1)")))
          .groupBy(shiftright(col("z"), 12).as("zbucket"))
          .agg(count(lit(1)).as("n"),
            min(col("x")).as("min_pk"), max(col("x")).as("max_pk"),
            min(col("y")).as("min_sk"), max(col("y")).as("max_sk"),
            min(when(col("rx") === col("x") && col("ry") === col("y"), 1)
              .otherwise(0)).as("rt_ok"))
          .withColumn("box_ok",
            when(col("max_pk") - col("min_pk") <= 63 &&
                 col("max_sk") - col("min_sk") <= 63, 1).otherwise(0))
          .orderBy(col("zbucket"))
      },
      Some {
        import graft.functions.ZOrder
        s"""WITH b AS (SELECT CAST(l_partkey AS BIGINT) AS x,
           |    CAST(l_suppkey AS BIGINT) AS y FROM lineitem),
           |zz AS (SELECT x, y, ${ZOrder.zSql("x", "y")} AS z FROM b),
           |rr AS (SELECT x, y, z, ${ZOrder.unspreadSql("z")} AS rx,
           |    ${ZOrder.unspreadSql("(z >> 1)")} AS ry FROM zz)
           |SELECT z >> 12 AS zbucket, CAST(count(*) AS BIGINT) AS n,
           |  min(x) AS min_pk, max(x) AS max_pk,
           |  min(y) AS min_sk, max(y) AS max_sk,
           |  min(CASE WHEN rx = x AND ry = y THEN 1 ELSE 0 END) AS rt_ok,
           |  CASE WHEN max(x) - min(x) <= 63 AND max(y) - min(y) <= 63
           |       THEN 1 ELSE 0 END AS box_ok
           |FROM rr GROUP BY z >> 12 ORDER BY zbucket""".stripMargin
      }),

    // ---- q54: dynamic partition pruning through a dim join -------------
    // The other half of the partition-layout story (q53 skips within
    // unpartitioned files; this skips whole PARTITIONS): a fact table
    // written partitioned by l_returnflag, joined to a dim whose filter
    // only the runtime knows — Spark broadcasts the dim, collects its
    // keys, and injects them into the fact scan's partition filters
    // (dynamicpruningexpression, pinned by PlanSpec), so the pruned
    // partitions' files are never opened. At 100 TB this is the
    // difference between scanning one day-partition and scanning the
    // lake. The oracle is the equivalent filtered aggregation over the
    // ORIGINAL table — the write, the partitioning, and the pruning must
    // all be result-invisible.
    Q("q54_dpp",
      (s, dir) => {
        val src = t(s, dir, "lineitem").select(col("l_returnflag"),
          col("l_orderkey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        val out = graft.RunDirs.dir("q54_dpp").toString
        graft.sources.Formats.writeParquet(src, out,
          partitionBy = Seq("l_returnflag"))
        // explicit schema for the same zero-row reason as q39
        val fact = s.read.schema(src.schema).parquet(out)
        val dim = t(s, dir, "lineitem")
          .select(col("l_returnflag").as("flag")).distinct()
          .filter(col("flag").isin("A", "R"))
        fact.join(dim, fact("l_returnflag") === dim("flag"))
          .groupBy(col("flag"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"))
          .orderBy(col("flag"))
      },
      Some("""SELECT l_returnflag AS flag,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |    AS BIGINT) AS total_cents
             |FROM lineitem
             |WHERE l_returnflag IN ('A', 'R')
             |GROUP BY l_returnflag
             |ORDER BY flag""".stripMargin)),

    // ---- q55: ordered string aggregation (LISTAGG surface) -------------
    // Per-customer order-priority journey in strict order-date order —
    // the LISTAGG / string_agg(... ORDER BY ...) surface. collect_list
    // is order-nondeterministic under parallelism, so the ordering is
    // re-imposed IN-ROW: collect structs, array_sort (lexicographic by
    // (date, key) — a total order, so any shuffle arrival order yields
    // the same array), then project and join. Groups are bounded by
    // orders-per-customer; the unbounded-group analogue of this layout
    // is t10's shard-parallel packing.
    Q("q55_string_agg",
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_orderpriority")).as("n_prio"),
          array_join(
            expr("transform(array_sort(collect_list(struct(o_orderdate, o_orderkey, o_orderpriority)))," +
              " x -> x.o_orderpriority)"), ">").as("journey"))
        .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
             |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
             |  string_agg(o_orderpriority, '>' ORDER BY o_orderdate, o_orderkey)
             |    AS journey
             |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // ---- q56: discrete percentiles (percentile_disc semantics) ---------
    // Per-customer median and p90 order value as ACTUAL data values
    // (percentile_disc), not interpolations (q26/q30 cover continuous):
    // the k-th smallest with k = ceil(q·n), picked from an in-row sorted
    // array. Index arithmetic avoids float multiples of q: ceil(n/2) =
    // floor((n+1)/2) and ceil(9n/10) = floor((9n+9)/10), and a double
    // division by 2/10 whose true quotient is integral rounds to exactly
    // that integer in IEEE, so floor never flips — both engines compute
    // the identical index. Groups bounded by orders-per-customer; the
    // unbounded-group form is the two-pass ranked shape (q51/p13).
    Q("q56_percentile_disc",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_custkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sort_array(collect_list(col("cents"))).as("sorted"))
        .select(col("o_custkey"), col("n_orders"),
          expr("element_at(sorted, CAST(floor((n_orders + 1) / 2) AS INT))").as("med_cents"),
          expr("element_at(sorted, CAST(floor((9 * n_orders + 9) / 10) AS INT))").as("p90_cents"))
        .orderBy(col("o_custkey")),
      Some("""WITH o AS (SELECT o_custkey,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
             |r AS (SELECT o_custkey, cents,
             |    row_number() OVER (PARTITION BY o_custkey ORDER BY cents) AS rn,
             |    count(*) OVER (PARTITION BY o_custkey) AS n FROM o)
             |SELECT o_custkey, CAST(max(n) AS BIGINT) AS n_orders,
             |  max(CASE WHEN rn = CAST(floor((n + 1) / 2) AS BIGINT)
             |      THEN cents END) AS med_cents,
             |  max(CASE WHEN rn = CAST(floor((9 * n + 9) / 10) AS BIGINT)
             |      THEN cents END) AS p90_cents
             |FROM r GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),
  )
}
