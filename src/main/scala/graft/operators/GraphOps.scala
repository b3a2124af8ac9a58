package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over an edge-list relation `(src BIGINT, dst BIGINT)` —
  * the reference's entire query surface, re-expressed relationally.
  *
  * The reference pipeline (`mapreducePredictionTwitter100.java:29-164`,
  * SURVEY.md §2) is scan → symmetrize flatMap → groupByKey (adjacency) →
  * per-node O(deg²) triad UDTF tagged with a sentinel-0 "this pair is a real
  * edge" marker → groupByKey on the pair → sentinel-test flatMap → distinct.
  * That is, relationally, a self-join plus a semi-join — which is exactly how
  * we implement it, so Catalyst picks the join strategy (broadcast vs
  * shuffled-hash vs sort-merge) and AQE splits skewed hub keys at runtime
  * instead of a hand-rolled groupByKey OOMing on the hub's deg² blowup.
  *
  * Semantics preserved from the reference (variant drivers — the base driver
  * has a bug and always returns ∅, SURVEY.md §2.9): graph is undirected,
  * multi-edges and self-loops tolerated (neither produces a degenerate
  * triangle), output triangles canonical `a < b < c`, unique.
  */
object GraphOps {

  /** Both directions of every edge — the reference's "edges must be
    * reciprocal" expansion (`mapreducePredictionTwitter.java:36-38`), as a
    * UNION ALL instead of a flatMap. */
  def symmetrize(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))

  /** Distinct undirected edges in canonical `u < v` form; drops self-loops
    * and multi-edge duplicates (the reference reaches the same end state via
    * its terminal `.distinct()` — dedup-early is output-equivalent and far
    * cheaper, SURVEY.md §7.6). */
  def canonicalEdges(edges: DataFrame): DataFrame =
    edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()

  /** Enumerate unique triangles, canonical `a < b < c`.
    *
    * For a triangle a<b<c, the canonical edge set contains exactly (a,b),
    * (a,c), (b,c): join edges sharing the low endpoint to generate open
    * triads, then semi-join the closing edge — the reference's sentinel
    * protocol (`mapreducePredictionTwitter100.java:52-153`) as a real
    * LEFT SEMI join. Joining canonical (not symmetrized) edges means each
    * triangle is produced exactly once — no terminal distinct, and the
    * triad fan-out is Σ C(deg_canon, 2) instead of Σ deg² over the full
    * adjacency.
    */
  def triangles(edges: DataFrame): DataFrame =
    trianglesFromCanonical(canonicalEdges(edges))

  /** Triangle join over an already-canonical `(u,v)` edge set. The plan
    * references the canonical set three times with *different* join keys,
    * so exchange reuse cannot deduplicate them (verified on the executed
    * plan) — drivers that own the lifecycle should `.persist()` the
    * canonical set first (see TriangleMain/GraphBench) to scan the input
    * once instead of three times. */
  def trianglesFromCanonical(canon: DataFrame): DataFrame = {
    val ab = canon.toDF("a", "b")
    val ac = canon.toDF("a", "c")
    val bc = canon.toDF("b", "c")
    ab.join(ac, "a").filter(col("b") < col("c"))
      .join(bc, Seq("b", "c"), "left_semi")
      .select(col("a"), col("b"), col("c"))
  }

  /** Unique triangles via DEGREE-ORDERED orientation — the "forward"
    * algorithm (Schank & Wagner 2005; the standard MapReduce triangle
    * fix, Suri & Vassilvitskii 2011): orient every canonical edge from
    * its lower-(degree, id) endpoint toward the higher, generate wedges
    * only between pairs of OUT-edges of a shared source, and close with
    * one semi-join against the oriented set.
    *
    * Why it exists next to [[triangles]]: the id-ordered join fans out
    * C(deg_lo(v), 2) wedges per node, and on a hub-skewed graph whose
    * hub happens to sort low — exactly the reference's Twitter
    * experiment (`mapreducePredictionTwitter100.java:52-87`), and
    * exactly the g18 fixture, whose hub is node 0 — that is the full
    * deg² blowup. Under the degree orientation every node's out-degree
    * is O(√m), so wedge volume is O(m^1.5) REGARDLESS of skew: the
    * blowup becomes structurally impossible rather than capped (g09/g22
    * trade recall for safety; this is exact — same output as
    * [[triangles]], property-proven on random graphs in
    * GraphPropertySpec).
    *
    * The oriented edge set is referenced three times (both wedge sides +
    * the closing semi-join) under different keys, so it is materialized
    * once — narrow (s, t, dt) rows, edge-sized. Ties in degree break by
    * node id, giving a TOTAL order both engines reproduce; the closing
    * edge of a wedge (t1 ≺ t2) is then always oriented t1 → t2, so the
    * semi-join needs no direction test. */
  def trianglesDegreeOrdered(edges: DataFrame): DataFrame = {
    val canon = canonicalEdges(edges)
    val deg = symmetrize(canon.toDF("src", "dst"))
      .groupBy(col("src").as("n")).agg(count(lit(1)).as("d"))
    val oriented = canon
      .join(deg.toDF("u", "du"), "u")
      .join(deg.toDF("v", "dv"), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
          .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
      .localCheckpoint()
    val wedges = oriented.toDF("s", "t1", "dt1")
      .join(oriented.toDF("s", "t2", "dt2"), "s")
      .filter(struct(col("dt1"), col("t1")) < struct(col("dt2"), col("t2")))
    wedges
      .join(oriented.select(col("s").as("t1"), col("t").as("t2")),
        Seq("t1", "t2"), "left_semi")
      // median of three via min/max composition, NOT s + t1 + t2 − min −
      // max: the sum overflows Long for 64-bit hash node ids (an
      // ArithmeticException under ANSI mode on exactly the inputs
      // [[triangles]] handles fine, which never does id arithmetic)
      .select(least(col("s"), col("t1"), col("t2")).as("a"),
        greatest(least(col("s"), col("t1")),
          least(greatest(col("s"), col("t1")), col("t2"))).as("b"),
        greatest(col("s"), col("t1"), col("t2")).as("c"))
  }

  /** Approximate triangle counting by deterministic edge sampling — the
    * DOULION estimator (Tsourakakis et al., KDD 2009): keep each
    * canonical edge with probability p = 1/`invP`, enumerate triangles on
    * the sample, scale the count by invP³. Unbiased, with variance that
    * vanishes as triangle mass grows — the standard answer when a graph
    * is too large even for the degree-ordered EXACT enumeration
    * ([[trianglesDegreeOrdered]]): the sample shrinks edge volume by p
    * and wedge volume by p², so at invP = 5 the dominant join does 4%
    * of the exact plan's work.
    *
    * The coin is a keyed content hash of the edge (PortableHash md5 —
    * the d02/d06 convention), NOT `rand()`: re-runs and the DuckDB
    * oracle reproduce the sample bit-for-bit, and the decision is a
    * per-edge map-side filter — no shuffle added before the (much
    * smaller) triangle join. A multiplicative-hash-mod-p coin is
    * deliberately avoided: mod a small p it degenerates to a residue
    * lattice (u + c·v ≡ 0), which keeps only triangles whose nodes all
    * share a residue class — a correlated, biased sample, not a coin.
    *
    * Returns one row: exact `edges_total` / `edges_sampled`, the raw
    * `tri_sampled`, and the `tri_est = tri_sampled · invP³` estimate. */
  def sampledTriangles(edges: DataFrame, invP: Int = 5): DataFrame = {
    require(invP >= 1, s"invP must be >= 1, got $invP")
    val canon = canonicalEdges(edges)
    val coin = graft.functions.PortableHash.baseHash(
      concat(col("u").cast("string"), lit("|"), col("v").cast("string")))
    // tiny by construction (p·|E|), and referenced three times by the
    // triangle join — materialize once
    val sampled = canon.filter(coin % invP === 0).localCheckpoint()
    val scale = invP.toLong * invP * invP
    canon.agg(count(lit(1)).as("edges_total"))
      .crossJoin(sampled.agg(count(lit(1)).as("edges_sampled")))
      .crossJoin(trianglesFromCanonical(sampled)
        .agg(count(lit(1)).as("tri_sampled")))
      .select(col("edges_total"), col("edges_sampled"), col("tri_sampled"),
        (col("tri_sampled") * lit(scale)).as("tri_est"))
  }

  /** Adjacency lists — the reference's first groupByKey stage
    * (`mapreducePredictionTwitter.java:45`, `adj(node, neighbors)`), as a
    * hash aggregation with the neighbor list kept sorted for determinism.
    * The reference retained multi-edge duplicates (SURVEY.md §2.3);
    * `distinctNeighbors = false` preserves that multiset semantics. */
  def adjacency(edges: DataFrame, distinctNeighbors: Boolean = true): DataFrame = {
    val sym =
      if (distinctNeighbors) symmetrize(canonicalEdges(edges).toDF("src", "dst"))
      else symmetrize(edges)
    sym.groupBy(col("src").as("node"))
      .agg(sort_array(collect_list(col("dst"))).as("neighbors"))
  }

  /** Cost-based triangle plan selection — wires the choice the two
    * baselines left to the user (r7 verdict gap #4): BASELINE_SELF
    * measures the id-ordered join winning on near-uniform graphs
    * (1.01 s vs 1.65 s at 100k edges — the orientation's degree pass is
    * pure overhead there) and the degree-ordered orientation winning on
    * power-law (69 s / 0.84 GB vs 107 s / 1.60 GB at 5M edges, and
    * structurally immune to the hub-sorts-low deg² blowup). The branch
    * predictor is the g21 skew certificate: max/median distinct degree,
    * measured here with ONE eager degree aggregate (max exact,
    * median via percentile_approx — the decision only picks a plan,
    * both branches are output-identical, so the median needs no
    * engine-portable definition and no collect of the degree list).
    * Threshold ~10 separates the two baseline regimes (uniform fixture
    * ≈ 1–2, power-law fixture ≥ 100).
    *
    * NOTE: building the plan runs the degree aggregate eagerly (the
    * knnJoin true-cardinality convention) — plan choice from measured
    * statistics, never from a guess that flaps at scale. When the caller
    * already knows the skew profile — composing over a not-yet-
    * materialized edge set, or re-invoking on a graph whose degree stats
    * are maintained as a pipeline artifact — pass
    * `knownStats = Some((maxDeg, medianDeg))` and plan construction is
    * lazy: no scan until the plan executes (the knnJoin `knownBytes`
    * convention, r8 ADVICE applied here). */
  def trianglesAuto(edges: DataFrame, skewThreshold: Long = 10,
      knownStats: Option[(Long, Long)] = None): DataFrame = {
    val (maxDeg, medDeg0) = knownStats.getOrElse {
      val stats = degrees(edges)
        .agg(max(col("degree")).cast("long").as("mx"),
          percentile_approx(col("degree"), lit(0.5), lit(10000)).cast("long").as("md"))
        .head()
      (if (stats.isNullAt(0)) 0L else stats.getLong(0),
        if (stats.isNullAt(1)) 1L else stats.getLong(1))
    }
    val medDeg = math.max(1L, medDeg0)
    if (maxDeg / medDeg >= skewThreshold) trianglesDegreeOrdered(edges)
    else triangles(edges)
  }

  /** Undirected degree (distinct neighbors; self-loops excluded). */
  def degrees(edges: DataFrame): DataFrame = {
    val canon = canonicalEdges(edges)
    symmetrize(canon.toDF("src", "dst"))
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("degree"))
  }

  /** Incrementally-MAINTAINED degrees — the certified producer for
    * [[trianglesAuto]]'s `knownStats` (r9 verdict #8). A pipeline that
    * keeps per-node degrees as a day-2 artifact folds each admitted
    * batch's canonical edges into the running table instead of
    * rescanning the graph: degree is ADDITIVE over a partition of the
    * distinct canonical edge set (each undirected edge contributes
    * exactly 1 to each endpoint), so fold(oldDegrees, batch) ==
    * degrees(old ∪ batch) exactly — PROVIDED `batchEdges` canonicalizes
    * to edges disjoint from the old set (the admission dedup every
    * incremental graph pipeline already runs; g25 constructs the
    * partition by edge hash and certifies mismatch-zero cross-engine,
    * and GraphOpsSpec drives trianglesAuto with the maintained stats to
    * prove the same plan and the same triangles come out). Cost: one
    * batch-sized degree pass + a degree-table-sized sum — never a
    * corpus re-read. */
  def foldDegrees(oldDegrees: DataFrame, batchEdges: DataFrame): DataFrame =
    oldDegrees.unionByName(degrees(batchEdges))
      .groupBy(col("node")).agg(sum(col("degree")).as("degree"))

  /** Declared schema of a persisted [[degrees]]/[[foldDegrees]] table —
    * the g30 versioned-state artifact reads never infer. */
  private[graft] val degreesSchema = new org.apache.spark.sql.types.StructType()
    .add("node", org.apache.spark.sql.types.LongType)
    .add("degree", org.apache.spark.sql.types.LongType)

  /** (maxDegree, medianDegree) from a degree table — the exact shape
    * [[trianglesAuto]]'s `knownStats` wants, so a maintained table from
    * [[foldDegrees]] plugs straight into lazy plan choice. */
  def degreeStats(deg: DataFrame): (Long, Long) = {
    val r = deg.agg(max(col("degree")).cast("long").as("mx"),
      percentile_approx(col("degree"), lit(0.5), lit(10000)).cast("long").as("md"))
      .head()
    (if (r.isNullAt(0)) 0L else r.getLong(0),
      if (r.isNullAt(1)) 1L else r.getLong(1))
  }

  /** Triangle-count DELTA from a day-2 edge batch, WITHOUT re-enumerating
    * day-1 triangles — the incremental form of the reference's own
    * growing-graph workload (README.md:16-26 reruns the whole job per
    * day). `canonFlagged` is the full day-2 canonical edge set (u, v,
    * is_batch); the delta counts, for each batch edge (u,v), the closing
    * vertices w whose two wing edges exist anywhere in the set —
    * attributing every new triangle to its lexicographically-LEAST batch
    * edge, so triangles with 2 or 3 new edges count exactly once: a wing
    * that is itself a batch edge participates only when lex-greater than
    * (u,v). Returns one row, `delta` BIGINT; day2_total = day1 + delta.
    *
    * Scale shape: batch × adjacency — two equi-joins whose fan-out is
    * Σ_{(u,v)∈B} deg(u), never a day-1 re-enumeration; the day-2 batch
    * is the small side and broadcasts. Certified fold == recompute by
    * g26 cross-engine and by the random-split property test. */
  def triangleDelta(canonFlagged: DataFrame): DataFrame = {
    val batch = canonFlagged.filter(col("is_batch"))
      .select(col("u"), col("v"))
    val adj = canonFlagged.select(col("u").as("x"), col("v").as("w"),
        col("u").as("lo"), col("v").as("hi"), col("is_batch").as("wb"))
      .unionByName(canonFlagged.select(col("v").as("x"), col("u").as("w"),
        col("u").as("lo"), col("v").as("hi"), col("is_batch").as("wb")))
    def wing(side: String) = adj.select(col("x").as(s"x_$side"),
      col("w"), col("lo").as(s"lo_$side"), col("hi").as(s"hi_$side"),
      col("wb").as(s"wb_$side"))
    def after(side: String) = !col(s"wb_$side") ||
      (col(s"lo_$side") > col("u")) ||
      (col(s"lo_$side") === col("u") && col(s"hi_$side") > col("v"))
    batch
      .join(wing("a"), col("x_a") === col("u"))
      .filter(col("w") =!= col("v"))
      .join(wing("b"), Seq("w"))
      .filter(col("x_b") === col("v") && after("a") && after("b"))
      .agg(count(lit(1)).cast("long").as("delta"))
  }

  /** Incremental CONNECTED-COMPONENT maintenance (g27) — g26's day-2
    * story for labels: fold a day-2 edge batch into existing component
    * labels WITHOUT rerunning CC over the full graph. The batch's edges
    * are CONTRACTED through the day-1 labels ((u,v) → (label(u),
    * label(v)), new nodes label themselves), CC runs on that contracted
    * graph — bounded by the BATCH, not the corpus: at 100 TB a full
    * large-star rerun is O(log n) rounds over all edges, while the
    * contracted graph is touched-components-sized — and the resulting
    * relabel map joins back onto the day-1 table. Exact because min-label
    * CC is a quotient construction: contracting each day-1 component to
    * its (min-id) label preserves the merged components' minima, so
    * fold(labels, batch) == recompute(old ∪ batch) node-for-node — which
    * g27 certifies cross-engine (mismatch row pinned 0) the way g25/g26
    * certify degrees and triangles.
    *
    * `day1` is (node, component) from [[connectedComponents]]; returns
    * (node, label) over the old ∪ batch node universe. */
  def foldComponents(day1: DataFrame, batchEdges: DataFrame): DataFrame = {
    val lu = day1.select(col("node").as("u"), col("component").as("lu"))
    val lv = day1.select(col("node").as("v"), col("component").as("lv"))
    val contracted = canonicalEdges(
        batchEdges.join(lu, Seq("u"), "left").join(lv, Seq("v"), "left")
          .select(coalesce(col("lu"), col("u")).as("src"),
            coalesce(col("lv"), col("v")).as("dst")))
      .select(col("u").as("src"), col("v").as("dst"))
    val remap = connectedComponents(contracted)
      .select(col("node").as("l0"), col("component").as("l1"))
    val batchNodes = symmetrize(batchEdges
        .select(col("u").as("src"), col("v").as("dst")))
      .select(col("src").as("node")).distinct()
    day1.select(col("node"), col("component").as("l0"))
      .unionByName(batchNodes.join(day1, Seq("node"), "left_anti")
        .select(col("node"), col("node").as("l0")))
      .join(remap, Seq("l0"), "left")
      .select(col("node"), coalesce(col("l1"), col("l0")).as("label"))
  }

  /** Common-neighbor counts for node pairs — the link-prediction score the
    * reference's README motivates (README.md:2, "Redundant Graph
    * Detection"). Returns pairs `u < v` with ≥ `minCommon` shared
    * neighbors. The wedge join fans out Σ deg(w)² — an OUTPUT explosion
    * on hub nodes, which AQE's skew split cannot fix (it rebalances
    * oversized shuffle-input partitions; a hub's input rows are few, its
    * join output is huge). The degree-cap pre-filter is therefore THE
    * mitigation for power-law graphs (ScaleSmoke measures it at 5M
    * edges); AQE skew split earns its keep on skewed fact joins, which
    * ScaleSmoke demonstrates separately. */
  def commonNeighbors(edges: DataFrame, minCommon: Long = 2,
      maxDegree: Long = Long.MaxValue): DataFrame = {
    // NOT checkpointed, deliberately: the wedge join references sym 2-4
    // times, but re-deriving it (scan + distinct + union, fully parallel)
    // measured FASTER than a localCheckpoint materialization barrier
    // (g03 at sf0.1: 3.2 s recompute vs 5.0 s checkpointed) — the
    // opposite trade from pageRankPpb's 12-reference unrolled loop
    val symAll = symmetrize(canonicalEdges(edges).toDF("src", "dst"))
    // degree-threshold hybrid (SURVEY.md §7.6): drop wedges through hub
    // nodes whose deg² fan-out would dominate — at power-law scale the
    // top hubs contribute O(deg²) wedge rows each; capping them bounds
    // the join while AQE's skew split handles the mid-range.
    val sym =
      if (maxDegree == Long.MaxValue) symAll
      else {
        val smallDeg = symAll.groupBy(col("dst").as("w"))
          .agg(count(lit(1)).as("deg")).filter(col("deg") <= maxDegree)
          .select(col("w"))
        symAll.join(broadcast(smallDeg), symAll("dst") === smallDeg("w"), "left_semi")
      }
    val n1 = sym.toDF("u", "w")
    val n2 = sym.toDF("v", "w")
    n1.join(n2, "w").filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= minCommon)
  }

  /** Link-prediction scores for candidate pairs — the end product the
    * reference's RGD pipeline feeds (README.md:16-26 ranks candidate
    * links by shared-neighbor evidence). For each non-adjacent-or-not
    * pair `u < v` with a common neighbor through a degree-capped center:
    *
    *  - `cn`: common-neighbor count (the g03/g09 score);
    *  - `ra_micro`: resource-allocation index (Zhou et al. 2009),
    *    Σ 1/deg(w), in exact micro-units — `1000000 div deg(w)` per
    *    wedge, an integer;
    *  - `aa_micro`: Adamic-Adar with the log discretized to the integer
    *    bit length of deg(w) (the g08 trick: `length(bin(deg))` is
    *    ⌊log₂⌋+1, identical in any engine) — Σ 1000000 div bitlen(deg).
    *
    * The float forms (1/ln deg) are NOT used: libm `ln` differs in the
    * last ulp across engines and FP sums re-order across partitions;
    * the integer surrogates rank near-identically and are bit-exact
    * everywhere. Common neighbors always have deg ≥ 2, so no degenerate
    * ln(1) term exists in either form. The wedge join is degree-capped
    * like g09 (Σ min(deg,cap)² fan-out — the power-law survival bound);
    * center degrees ride the wedge rows, so scoring adds zero joins. */
  def linkPredictionScores(edges: DataFrame, maxDegree: Long,
      minCommon: Long = 1): DataFrame = {
    // re-derived per reference, not checkpointed — see commonNeighbors
    val sym = symmetrize(canonicalEdges(edges).toDF("src", "dst"))
    val smallDeg = sym.groupBy(col("dst").as("w"))
      .agg(count(lit(1)).as("deg")).filter(col("deg") <= maxDegree)
    val capped = sym.join(broadcast(smallDeg), sym("dst") === smallDeg("w"))
      .select(col("src"), col("w"), col("deg"))
    val n1 = capped.toDF("u", "w", "deg")
    val n2 = capped.select(col("src").as("v"), col("w").as("w2"))
    n1.join(n2, col("w") === col("w2")).filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000 div deg")).as("ra_micro"),
        sum(expr("1000000 div length(bin(deg))")).as("aa_micro"))
      .filter(col("cn") >= minCommon)
  }

  /** Per-node triangle participation count — a single pass over the
    * triangle set (`explode` of the three corners), not three unioned
    * projections: exchange reuse cannot deduplicate the differing
    * projections, so the union form re-ran the whole triangle join per
    * branch (~3× the cost, measured 8.8 s vs 1.2 s for g01 at sf0.1). */
  def nodeTriangleCounts(edges: DataFrame): DataFrame =
    triangles(edges)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))

  /** Whole-graph summary statistics in one row — the numbers that size a
    * graph job before it runs: global transitivity (3·triangles/wedges,
    * exact integer micro-units) and degree assortativity (Pearson
    * correlation of endpoint degrees over the symmetrized edge set —
    * disassortative power-law graphs are the wedge-join adversary, so
    * this is the metric that predicts whether g09's degree cap is
    * needed). The correlation reuses [[Profile]]'s exact-integer-sum
    * formula text: decimal(38,0) power sums, one shared IEEE float stage
    * — never an engine's built-in corr(). */
  def graphStats(edges: DataFrame): DataFrame = {
    val canon = canonicalEdges(edges)
    val deg = degrees(edges)
    val tri = triangles(edges).agg(count(lit(1)).as("t"))
    val wn = deg.agg(sum(expr("degree * (degree - 1) div 2")).as("w"),
      count(lit(1)).as("n_nodes"))
    val ne = canon.agg(count(lit(1)).as("n_edges"))
    val sym = symmetrize(canon.toDF("src", "dst"))
    val sums = sym
      .join(deg.select(col("node").as("src"), col("degree").as("dx")), "src")
      .join(deg.select(col("node").as("dst"), col("degree").as("dy")), "dst")
      .selectExpr("CAST(dx AS DECIMAL(38,0)) AS x", "CAST(dy AS DECIMAL(38,0)) AS y")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("isx"), sum(col("y")).as("isy"),
        sum(expr("x*x")).as("isxx"), sum(expr("y*y")).as("isyy"),
        sum(expr("x*y")).as("isxy"))
      .selectExpr("CAST(n AS DOUBLE) AS nd",
        "CAST(isx AS DOUBLE) AS sx", "CAST(isy AS DOUBLE) AS sy",
        "CAST(isxx AS DOUBLE) AS sxx", "CAST(isyy AS DOUBLE) AS syy",
        "CAST(isxy AS DOUBLE) AS sxy")
    tri.crossJoin(wn).crossJoin(ne).crossJoin(sums)
      .selectExpr("n_nodes", "n_edges", "t AS n_triangles",
        "CAST(CAST(3000000 AS DECIMAL(38,0)) * t div w AS BIGINT) AS transitivity_micro",
        s"round((${Profile.corrNum}) / (${Profile.corrDen}), 6) AS assortativity")
  }

  /** Local clustering coefficient per node: closed wedges over all wedges,
    * `2·T(v) / (deg(v)·(deg(v)−1))` for nodes with degree ≥ 2 — the
    * per-node density score behind the reference's redundant-graph ranking
    * (triangles normalized by opportunity). Emitted in exact integer
    * micro-units (`div`, no FP division) so the value is engine-portable.
    *
    * Shape: [[degrees]] and [[nodeTriangleCounts]] are both
    * map-side-combined aggregations over the same canonical edge set; the
    * final LEFT join is node-keyed (high cardinality), so the plan is two
    * aggregations plus one hash join — no wedge materialization beyond
    * the triangle join g01 already bounds. */
  def clusteringCoefficient(edges: DataFrame): DataFrame =
    degrees(edges).filter(col("degree") >= 2)
      .join(nodeTriangleCounts(edges), Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("cc_micro",
        expr("2000000 * n_triangles div (degree * (degree - 1))"))

  /** Frees the block-manager storage behind a `localCheckpoint()`ed
    * DataFrame. `df.unpersist()` does not reach checkpoint blocks — the
    * data lives in the RDD the plan's `LogicalRDD` leaf wraps — so
    * iterative loops that checkpoint every round must release the previous
    * round explicitly or accumulate one cached label table per round. */
  private[graft] def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Connected components: label every node with the min node id of its
    * component. Two interchangeable algorithms behind one API — both
    * converge to the identical labeling (GraphPropertySpec proves it on
    * random graphs), so the choice is purely a scale decision:
    *
    *   - `"star"` (default): alternating large-star/small-star
    *     (Kiveris et al., "Connected Components in MapReduce and
    *     Beyond", SoCC'14). Rounds = O(log n) REGARDLESS of graph
    *     diameter — the 100 TB path, where a high-diameter component
    *     (web chains, road networks) would starve a propagation loop.
    *   - `"minlabel"`: min-label propagation; rounds = diameter. Fewer
    *     shuffles per round, so it wins on hub-dense low-diameter
    *     graphs; kept as the cross-check and small-graph fast path.
    *
    * Per round both do driver-coordinated iteration with a
    * `localCheckpoint` (plan truncation — the lineage otherwise grows
    * per round until analysis dominates), freeing the previous round's
    * checkpoint blocks ([[freeLocalCheckpoint]]). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50,
      algorithm: String = "star"): DataFrame = algorithm match {
    case "star"     => connectedComponentsStar(edges, maxIter)._1
    case "minlabel" => connectedComponentsMinLabel(edges, maxIter)._1
    case other => throw new IllegalArgumentException(
      s"unknown connected-components algorithm '$other' (star | minlabel)")
  }

  /** Large-star/small-star alternation to a fixed point; returns
    * `(labels, roundsUsed)` — ScaleSmoke logs the round count as the
    * scale evidence. One round =
    *
    *   large-star: every node attaches its LARGER neighbors to the min
    *   of its neighborhood (incl. itself) — hub edges migrate to
    *   component minima, halving star heights geometrically;
    *   small-star: every node attaches its smaller-or-equal neighbors
    *   (and itself) to their min — collapses the chains large-star
    *   leaves.
    *
    * Both halves are pure relational ops (groupBy-min + equi-join +
    * distinct, all map-side-combinable hash shuffles on the node key),
    * so AQE handles hub skew and the edge multiset never grows beyond
    * 2|E|. Convergence = the canonical edge set is unchanged over a
    * full round, detected by (count, xor-of-hashes) — one cheap
    * aggregate per round on the already-checkpointed set, no diff join.
    * At the fixed point the set is exactly the star forest
    * {(v, min(component)) : v not a root}. */
  /** Measurement toggle for the per-round checkpoint mode (A/B tool —
    * graft.tools.CcBench flips it inside one JVM so eager vs lazy compare
    * under identical JIT state); production default is lazy. */
  @volatile private[graft] var ccEagerCheckpoint = false

  def connectedComponentsStar(edges: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    val canon = canonicalEdges(edges).persist()
    val nodes = canon.select(explode(array(col("u"), col("v"))).as("node"))
      .distinct().localCheckpoint()

    // Both halves hash-partition the edge list ONCE by the grouping node
    // (explicit repartition) so the min-aggregation runs exchange-free on
    // it and the join's probe side reuses the same exchange (ReuseExchange
    // dedups the identical subtree): one shuffle of the edges per half
    // instead of two. With the final distinct that is 3 shuffles per
    // round — the round cost that multiplies by O(log n).

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u"))
      val mins = sym.groupBy(col("u").as("n"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      sym.join(mins, sym("u") === mins("n"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
    }

    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
        .repartition(col("u"))
      val mins = oriented.groupBy(col("u").as("n")).agg(min(col("v")).as("m"))
      val om = oriented.join(mins, oriented("u") === mins("n"))
      om.filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(om.select(col("u"), col("m").as("v")))
    }

    // store pairs canonically (big, small): large-star emits (v, m) with
    // v > m by construction, small-star likewise — `u` is always the
    // larger end, so distinct needs no least/greatest normalization
    var e = canon.select(col("v").as("u"), col("u").as("v")).localCheckpoint()
    var prev: (Long, Long) = (-1L, -1L)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // LAZY checkpoint (r15 verdict #1): the convergence aggregate below
      // is the round's ONLY action — its execution computes the new edge
      // set AND caches it (the lazy checkpoint materializes via
      // getOrCompute as the aggregate's scan pulls the rows), so each
      // round submits one Spark job instead of two (eager checkpoint
      // count + separate aggregate). Plan shape is untouched: the same
      // 3 shuffles per round, the same aggregate — only the separate
      // materialization job (and its extra pass over the cached blocks)
      // is gone. JobsPerRoundSpec pins the 1-job-per-round contract.
      val next = smallStar(largeStar(e)).distinct()
        .localCheckpoint(ccEagerCheckpoint)
      val chk = next.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v"))))
        .collect().head
      val cur = (chk.getLong(0), if (chk.isNullAt(1)) 0L else chk.getLong(1))
      converged = cur == prev
      prev = cur
      freeLocalCheckpoint(e)
      e = next
      it += 1
    }
    // converged star forest: every non-root points straight at its
    // component min; roots never appear on the big end. The min-aggregate
    // (a no-op at the fixed point, where each u occurs once) also keeps
    // the labeling well-formed — exactly one row per node — if maxIter
    // ran out before convergence, where the raw edge set could still
    // hold conflicting (v, m1)/(v, m2) pairs.
    val labels = nodes
      .join(e.groupBy(col("u").as("node")).agg(min(col("v")).as("cmp")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("cmp"), col("node")).as("component"))
    canon.unpersist()
    (labels, it)
  }

  /** Min-label propagation to a fixed point: each
    * node's label starts as its own id and iteratively takes the min of
    * its neighborhood; at convergence label = min node id of the
    * component.
    *
    * Iterations are driver-coordinated (the standard shape for iterative
    * graph algorithms on Spark — GraphX's Pregel does the same): each
    * round is ONE shuffle (join + min-aggregate), results are persisted
    * and the previous round unpersisted, and convergence costs one
    * `count()`. Rounds needed = graph diameter — see
    * [[connectedComponentsStar]] for the O(log n)-round 100 TB path;
    * this min-propagation form is the exact, portable fixed point the
    * oracle can re-derive as a recursive closure. Returns
    * `(labels, roundsUsed)` like [[connectedComponentsStar]]. */
  def connectedComponentsMinLabel(edges: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    val sym = symmetrize(canonicalEdges(edges).toDF("src", "dst")).persist()
    // localCheckpoint (not persist) each round: it truncates the logical
    // plan, which otherwise grows by one join per iteration until analysis
    // and codegen dominate — the classic iterative-DataFrame OOM
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // edge relax: take the min label over the neighborhood. (A
      // pointer-jumping variant — label <- label(label) each round — was
      // measured and reverted: on these hub-dense graphs the label
      // converges in few rounds anyway, and the extra self-join +
      // checkpoint per round cost more than the rounds it saved.)
      val nbrMin = sym.join(labels, sym("dst") === labels("node"))
        .groupBy(sym("src").as("n2")).agg(min(col("label")).as("nbr"))
      val next = labels.join(nbrMin, labels("node") === nbrMin("n2"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("nl"))
        .localCheckpoint(false) // lazy: the convergence count materializes it
      changed = next.filter(col("nl") < col("label")).count()
      freeLocalCheckpoint(labels)
      labels = next.select(col("node"), col("nl").as("label"))
      it += 1
    }
    sym.unpersist()
    (labels.select(col("node"), col("label").as("component")), it)
  }

  /** k-core: the maximal subgraph in which every node has degree ≥ k,
    * by iterative peeling — drop all nodes below degree k, recompute
    * degrees, repeat to the fixed point (simultaneous removal per round,
    * the textbook semantics). Returns `(nodes-with-core-degree, rounds)`.
    *
    * Each round is one degree aggregation (map-side combined) plus two
    * semi-joins of the edge set against the surviving nodes — all hash
    * shuffles on the node key, AQE-friendly, and the edge set only
    * shrinks. `localCheckpoint` per round truncates the growing plan and
    * the previous round's blocks are freed ([[freeLocalCheckpoint]]);
    * convergence is edge-count stability (peeling is monotone decreasing,
    * so equal count ⇔ fixed point). Rounds needed = peeling depth of the
    * graph — bounded by the longest chain the peel unravels, NOT by
    * O(log n): a path peels from its ends at one layer per round. That is
    * inherent to the simultaneous-removal semantics (matching the
    * oracle's unrolled rounds); at 100 TB you bound it with `maxIter` and
    * accept a slightly-larger-than-k-core supergraph if the budget runs
    * out. */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 50): (DataFrame, Int) = {
    var e = canonicalEdges(edges).localCheckpoint()
    var nEdges = e.count()
    var it = 0
    var converged = nEdges == 0
    while (!converged && it < maxIter) {
      val keep = symmetrize(e.toDF("src", "dst"))
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src"))
      val next = e.join(keep.toDF("u"), Seq("u"), "left_semi")
        .join(keep.toDF("v"), Seq("v"), "left_semi")
        .localCheckpoint(false) // lazy: the convergence count materializes it
      val m = next.count()
      converged = m == nEdges
      nEdges = m
      freeLocalCheckpoint(e)
      e = next
      it += 1
    }
    val core = symmetrize(e.toDF("src", "dst"))
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("core_degree"))
    (core, it)
  }

  /** Fixed-point (integer) PageRank: ranks are parts-per-billion longs,
    * contributions use integer division, damping is 85/100 in integer
    * arithmetic. Floating-point PageRank sums in nondeterministic order,
    * so two engines (or two RUNS at different parallelism) disagree in
    * the last ulps — the fixed-point formulation is bit-reproducible
    * anywhere, which is worth more at 100 TB than the dropped sub-ppb
    * precision. `iters` is fixed (no convergence test): each iteration is
    * one join + one aggregation, all map-side-combinable. */
  def pageRankPpb(edges: DataFrame, iters: Int = 3): DataFrame =
    pageRankPpbCore(edges, iters, None)

  /** WARM-START PageRank (g28) — the day-2 maintenance arm of
    * [[pageRankPpb]], completing the incremental family (g25 degrees,
    * g26 triangles, g27 components): after a batch of new edges, resume
    * the integer fixed point FROM yesterday's ranks instead of the
    * uniform vector. Contract (deterministic, oracle-replayable): nodes
    * present in `init` keep their rank as the starting value; nodes new
    * to the graph start at ⌊SCALE/N₂⌋ with N₂ the grown node count; the
    * iteration itself is byte-identical to the cold loop over the grown
    * graph. Warm-with-uniform == cold is property-proven, and the
    * convergence VALUE is measured (GraphOpsSpec): after a small batch
    * the warm iterate is strictly closer to the day-2 fixed point than
    * the cold iterate at every round budget — at 100 TB that is the
    * difference between 2 day-2 sweeps and re-paying the full cold
    * schedule, with each sweep one join + one map-side-combinable agg. */
  def pageRankPpbFrom(edges: DataFrame, init: DataFrame,
      iters: Int): DataFrame =
    pageRankPpbCore(edges, iters, Some(init))

  private def pageRankPpbCore(edges: DataFrame, iters: Int,
      init: Option[DataFrame]): DataFrame = {
    val SCALE = 1000000000L
    // localCheckpoint, NOT persist+unpersist: the returned plan is lazy,
    // so an unpersist-before-return would silently evaporate the cache
    // and the executed query would recompute the canon-distinct subtree
    // once per iteration per reference (~4 scans/iteration in the
    // unrolled plan). The checkpoint materializes the edge table once
    // and every iteration reads the blocks.
    // lazy checkpoints (r16): the node-count action right below
    // materializes deg AND (through its lineage) sym in one job — the
    // eager form paid two extra materialization jobs for the same cache
    val sym = symmetrize(canonicalEdges(edges).toDF("src", "dst"))
      .localCheckpoint(false)
    // the degree key gets its OWN name: deg derives from sym, so an
    // unaliased deg("src") carries sym's attribute id and the join
    // predicate is literally src == src — Spark resolves it through its
    // self-join disambiguation heuristic (correct here, but warned per
    // construction and one analyzer change away from ambiguous)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .toDF("dnode", "deg").localCheckpoint(false)
    val n = deg.count()
    // empty graph: no nodes to rank (and SCALE/n would divide by zero)
    if (n == 0)
      return deg.select(col("dnode").as("node"), lit(0L).as("rank_ppb")).limit(0)
    var ranks = init match {
      case None =>
        deg.select(col("dnode").as("node"), lit(SCALE / n).as("r"))
      case Some(warm) =>
        // day-1 ranks carry over; nodes the batch introduced start
        // uniform on the GROWN node count (the documented contract)
        deg.select(col("dnode").as("node"))
          .join(warm.select(col("node"), col("rank_ppb").as("r0")),
            Seq("node"), "left")
          .select(col("node"),
            coalesce(col("r0"), lit(SCALE / n)).as("r"))
    }
    for (_ <- 1 to iters) {
      val contrib = sym.join(ranks, sym("src") === ranks("node"))
        .join(deg, sym("src") === col("dnode"))
        .select(sym("dst").as("node"), expr("r div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("cs"))
      // every node of the symmetrized graph has in-edges, so no dangling
      // base-only rows are needed
      ranks = contrib.select(col("node"),
        (lit(SCALE * 15 / 100 / n) + expr("85 * cs div 100")).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_ppb"))
  }

  /** Personalized PageRank from a deterministic seed set — the
    * graph-feature sibling of [[pageRankPpb]] (proximity TO the seeds
    * rather than global centrality; the standard random-walk feature for
    * link prediction and graph-based retrieval). Same parts-per-billion
    * integer fixed point, so results are bit-identical at any parallelism
    * and in any engine; the teleport mass returns to the SEEDS, not to
    * every node.
    *
    * Scale shape: the rank vector starts SPARSE (seeds only) and only
    * ever contains nodes within `iters` hops of a seed — each round is
    * one join keyed on the rank frontier, so early iterations touch a
    * neighborhood, not the graph (the global variant pays the full n
    * every round). Rows whose integer contributions truncate to 0 are
    * carried, not dropped — the oracle's unrolled algebra keeps them and
    * bit-parity is the contract. */
  def personalizedPageRankPpb(edges: DataFrame, seedMod: Long = 100,
      iters: Int = 3): DataFrame = {
    val SCALE = 1000000000L
    // localCheckpoint for the same reason as [[pageRankPpb]]: the lazy
    // returned plan must read materialized blocks, not recompute the
    // edge derivation per iteration per reference
    // lazy checkpoints (r16, the pageRankPpb rule): the seed-count action
    // below materializes seeds → deg → sym in one job train
    val sym = symmetrize(canonicalEdges(edges).toDF("src", "dst"))
      .localCheckpoint(false)
    // dnode rename: same src==src self-join hazard as [[pageRankPpb]]
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .toDF("dnode", "deg").localCheckpoint(false)
    val seeds = deg.select(col("dnode").as("node"))
      .filter(pmod(col("node"), lit(seedMod)) === 0).localCheckpoint(false)
    val nSeeds = seeds.count()
    // no seeds (empty graph, or no node ≡ 0 mod seedMod): no proximity
    // mass to spread — empty result, not a division by zero
    if (nSeeds == 0)
      return seeds.select(col("node"), lit(0L).as("rank_ppb")).limit(0)
    var ranks = seeds.select(col("node"), lit(SCALE / nSeeds).as("r"))
    for (_ <- 1 to iters) {
      val contrib = sym.join(ranks, sym("src") === ranks("node"))
        .join(deg, sym("src") === col("dnode"))
        .select(sym("dst").as("node"), expr("r div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("cs"))
      val tele = seeds.select(col("node"), lit(SCALE * 15 / 100 / nSeeds).as("t"))
      ranks = contrib.join(tele, Seq("node"), "full")
        .select(col("node"),
          (coalesce(col("t"), lit(0L)) +
            expr("85 * coalesce(cs, CAST(0 AS BIGINT)) div 100")).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_ppb"))
  }

  /** Exact k-hop neighborhood function |B(v,k)| — distinct nodes within
    * ≤ `hops` of each node, self included (the N(v,h) of Palmer et al.
    * 2002). Level-synchronous frontier BFS over the reached-PAIR set:
    * each round expands only the newly-reached frontier (anti-join
    * against the accumulated set), so per-round join input is the
    * frontier, not the whole closure, and nothing counts walks (g10's
    * bounded-walk multiset grows deg^k; this is the distinct-set
    * question). Exact pair materialization is inherently Ω(Σ_v |B(v,k)|)
    * — up to n² rows on a low-diameter graph — so the operator a 100 TB
    * graph runs is [[hyperballReach]]; this exact form is its gate-scale
    * certifier and the small-graph tool. */
  def khopReach(edges: DataFrame, hops: Int): DataFrame = {
    val sym = symmetrize(canonicalEdges(edges).toDF("src", "dst"))
    // The expansion joins frontier (itself derived from sym) back against
    // the edge table every round; a disjoint-schema copy keeps the
    // attribute lineages separate (the commonNeighbors pattern).
    val nbr = sym.select(col("src").as("e_src"), col("dst").as("e_dst"))
    var reach = sym.select(col("src").as("root"), col("src").as("node")).distinct()
    var frontier = reach
    for (_ <- 1 to hops) {
      val expanded = frontier.join(nbr, col("node") === col("e_src"))
        .select(col("root"), col("e_dst").as("node")).distinct()
      frontier = expanded.join(reach, Seq("root", "node"), "left_anti")
      reach = reach.unionByName(frontier)
    }
    reach.groupBy(col("root")).agg(count(lit(1)).as("reach_n"))
  }

  /** Bounded walk COUNTS from one source, aggregated per end node (g29 —
    * r12 verdict #5): the iterative operator form of g10's recursive
    * CTE. The CTE carries ONE ROW PER WALK (Σ degree³ rows at 3 hops —
    * a multiset that grows deg^k and dies at 100×); this frontier folds
    * the multiset as it grows: state is `(node, walk_count)` — bounded
    * by the NODE SET — and each hop is one equi-join with the edge
    * table plus one map-side-combinable sum, [[khopReach]]'s shape with
    * counts instead of distinct. The depth-0 walk (the source itself)
    * counts, matching the CTE's anchor row; g10 stays registered as the
    * SQL-feature pin, g29 is the form the library runs at scale, and
    * g29's oracle IS g10's recursive CTE — the cross-engine proof the
    * fold equals the row-per-walk enumeration. */
  def boundedWalkCounts(edges: DataFrame, source: Long, hops: Int): DataFrame = {
    val spark = edges.sparkSession
    val sym = symmetrize(canonicalEdges(edges).toDF("src", "dst"))
      // lazy: scanned once per hop on BOTH plan arms off the one cached
      // RDD; hop 1 of the terminal action materializes it
      .localCheckpoint(false)
    // the seed node as a RANGE attribute, not a lit(): a constant-folded
    // seed turns hop 1's equi condition into a pushed filter and the
    // join into a nested loop — harmless on one row, but the plan shape
    // must be the one a multi-source variant (a real seed table) gets
    var frontier = spark.range(source, source + 1)
      .select(col("id").as("node"), lit(1L).as("cnt"))
    var acc = frontier
    for (_ <- 1 to hops) {
      frontier = frontier.join(sym, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("cnt")).as("cnt"))
        .select(col("dst").as("node"), col("cnt"))
      acc = acc.unionByName(frontier)
    }
    acc.groupBy(col("node")).agg(sum(col("cnt")).as("n_walks"))
  }

  /** HyperBall (Boldi & Vigna 2013): the k-hop neighborhood function from
    * per-node HLL registers instead of reached-pair sets. Every node
    * starts with the register row of its own key; each round folds each
    * neighbor's register table into the node's by elementwise max — the
    * same commutative-idempotent monoid p08/d11/st13 certify for slicing
    * and incremental folds, applied along edges — so after k rounds node
    * v's registers sketch exactly B(v,k). State is ≤ n·m register rows
    * (m = 512) REGARDLESS of reach: the bound that estimates multi-hop
    * reach on a 100 TB graph where the exact pair set (up to n² rows)
    * cannot be materialized. The registered query carries the gate's
    * certification arm — exact |B(v,k)| from [[khopReach]] joined per
    * node, `within_bound` pinning the estimate inside max(5, 15%) of
    * exact — and every quantity is deterministic given the portable
    * hash, so the gate checks exact integers, not a tolerance. The
    * oracle builds each node's registers from the recursive-CTE closure
    * SET instead of by propagation (max over a union == max over folds),
    * so matching registers also certify the propagation itself. */
  /** The estimation arm of [[hyperballReach]] alone: per-node
    * `(root, nonzero_registers, est_reach)` from the k-round register
    * fold, no exact-BFS certification join. This is the operator a
    * 100 TB graph actually runs (state ≤ n·512 register rows regardless
    * of reach); ScaleSmoke times it on the 5M-edge power-law graph where
    * the exact pair set is unmaterializable. */
  def hyperballEstimates(edges: DataFrame, hops: Int): DataFrame = {
    val m = 1 << 9
    val sym = symmetrize(canonicalEdges(edges).toDF("src", "dst"))
    val nodes = sym.select(col("src").as("root")).distinct()
    var regs = Profile.hllBucketRho(
        nodes.select(col("root"), col("root").cast("string").as("k")),
        slices = 1, carry = Seq("root"))
      .select(col("root"), col("bucket"), col("rho"))
    // regs derives from sym (via nodes); fold against a disjoint-schema
    // copy of the edge table so the per-round join is never ambiguous.
    val nbr = sym.select(col("src").as("e_src"), col("dst").as("e_dst"))
    for (_ <- 1 to hops) {
      val folded = regs.join(nbr, col("root") === col("e_dst"))
        .select(col("e_src").as("root"), col("bucket"), col("rho"))
      regs = regs.unionByName(folded)
        .groupBy(col("root"), col("bucket")).agg(max(col("rho")).as("rho"))
    }
    regs.groupBy(col("root"))
      .agg(count(lit(1)).as("nonzero_registers"),
        sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 40 - rho) AS BIGINT)")).as("s_present"))
      .withColumn("s_total",
        col("s_present") + (lit(m.toLong) - col("nonzero_registers")) * lit(1L << 40))
      .withColumn("est_reach", expr(Profile.hllEstFormula(m)))
  }

  def hyperballReach(edges: DataFrame, hops: Int): DataFrame = {
    val stats = hyperballEstimates(edges, hops)
    val exact = khopReach(edges, hops).withColumnRenamed("reach_n", "n_exact")
    stats.join(exact, "root")
      .select(col("root"), col("n_exact"), col("est_reach"),
        col("nonzero_registers"),
        when(abs(col("est_reach") - col("n_exact")) * 100 <=
             greatest(lit(500L), lit(15L) * col("n_exact")), 1)
          .otherwise(0).as("within_bound"))
      .orderBy(col("root"))
  }

  // ---- driver queries over a graph derived from the fixture corpus -----
  // The sf dirs carry no edge table, so the oracle-checked graph queries
  // derive a deterministic graph from lineitem: one edge per order's first
  // line, nodes = keys mod 4000. Same derivation in the DuckDB SQL.

  // Measured and left alone (r15 optimization): fanning these scans out
  // ahead of the canonicalEdges distinct (graft.FanOut on (src, dst))
  // REGRESSED every g-query by 15–50% — the mod/hash projection and the
  // distinct's partial aggregation are too cheap per row to pay for an
  // extra exchange, and the canonical set is referenced up to three
  // times per query, each reference re-paying it.
  private def derivedEdges(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_linenumber") === 1)
      .select((col("l_orderkey") % 4000).as("src"),
        (col("l_partkey") % 4000).as("dst"))

  private val derivedSql =
    """WITH e AS (SELECT l_orderkey % 4000 AS src, l_partkey % 4000 AS dst
      |           FROM lineitem WHERE l_linenumber = 1),
      |canon AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      |          FROM e WHERE src <> dst)""".stripMargin

  // ---- skewed (power-law) derived graph --------------------------------
  // The mod-4000 graph above is near-uniform; the reference's entire
  // experiment was the deg² hub blowup on Twitter-skew graphs
  // (mapreducePredictionTwitter100.java:52-87). g18–g21 gate the same
  // operators on a deterministic POWER-LAW graph: a Knuth multiplicative
  // hash turns each key into a uniform m ∈ [0, 1e6), and an integer cube
  // ramp maps it to node = m³ div 2.5e14 ∈ [0, 4000) — P(node = k) ∝
  // k^(-2/3), so node 0 is a hub absorbing ~6.3% of all endpoint draws
  // (measured max/median distinct degree ≈ 650 at sf0.01; g21 certifies
  // the ratio through the oracle). All-integer arithmetic — the hash,
  // cube, and floor-division reproduce bit-for-bit in DuckDB (`div`/`//`
  // agree on nonnegative operands), no IEEE pow() anywhere.

  private def skewedEdges(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_linenumber") === 1)
      .selectExpr(
        "((l_orderkey * 2654435761) % 1000000) AS mo",
        "((l_partkey * 2654435761) % 1000000) AS mp")
      .selectExpr(
        "(mo*mo*mo) div 250000000000000 AS src",
        "(mp*mp*mp) div 250000000000000 AS dst")

  private val skewSql =
    """WITH m AS (SELECT (l_orderkey * 2654435761) % 1000000 AS mo,
      |                  (l_partkey * 2654435761) % 1000000 AS mp
      |           FROM lineitem WHERE l_linenumber = 1),
      |e AS (SELECT (mo*mo*mo) // 250000000000000 AS src,
      |             (mp*mp*mp) // 250000000000000 AS dst FROM m),
      |canon AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      |          FROM e WHERE src <> dst)""".stripMargin

  val queries: Seq[Q] = Seq(

    // g01 runs the COST-BASED chooser (trianglesAuto): the near-uniform
    // derived graph measures skew ≈ 1 so the id-ordered join is picked;
    // on a power-law input the same entry point takes the degree-ordered
    // orientation (g23's plan). Both branches are output-identical
    // (property-proven), so the oracle is unchanged. g18 stays pinned to
    // the raw id-ordered join: its job is proving that plan SURVIVES the
    // hub graph, not avoiding it.
    Q("g01_triangles",
      (s, dir) => trianglesAuto(derivedEdges(s, dir))
        .orderBy(col("a"), col("b"), col("c")),
      Some(s"""$derivedSql
              |SELECT t1.u AS a, t1.v AS b, t2.v AS c
              |FROM canon t1
              |JOIN canon t2 ON t1.u = t2.u AND t1.v < t2.v
              |JOIN canon t3 ON t3.u = t1.v AND t3.v = t2.v
              |ORDER BY a, b, c""".stripMargin)),

    Q("g02_degrees",
      (s, dir) => degrees(derivedEdges(s, dir))
        .orderBy(col("node")),
      Some(s"""$derivedSql,
              |sym AS (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon)
              |SELECT src AS node, count(*) AS degree
              |FROM sym GROUP BY src
              |ORDER BY node""".stripMargin)),

    Q("g03_common_neighbors",
      (s, dir) => commonNeighbors(derivedEdges(s, dir), minCommon = 1)
        .orderBy(col("u"), col("v")),
      Some(s"""$derivedSql,
              |sym AS (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon)
              |SELECT n1.src AS u, n2.src AS v, count(*) AS cn
              |FROM sym n1 JOIN sym n2 ON n1.dst = n2.dst
              |WHERE n1.src < n2.src
              |GROUP BY n1.src, n2.src
              |HAVING count(*) >= 1
              |ORDER BY u, v""".stripMargin)),

    Q("g05_adjacency",
      (s, dir) => adjacency(derivedEdges(s, dir))
        .select(col("node"), size(col("neighbors")).cast("long").as("degree"),
          array_join(col("neighbors"), ",").as("neighbors_csv"))
        .orderBy(col("node")),
      Some(s"""$derivedSql,
              |sym AS (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon)
              |SELECT src AS node,
              |  CAST(count(*) AS BIGINT) AS degree,
              |  string_agg(dst::VARCHAR, ',' ORDER BY dst) AS neighbors_csv
              |FROM sym GROUP BY src
              |ORDER BY node""".stripMargin)),

    Q("g04_node_triangle_counts",
      (s, dir) => nodeTriangleCounts(derivedEdges(s, dir))
        .orderBy(col("node")),
      Some(s"""$derivedSql,
              |tri AS (SELECT t1.u AS a, t1.v AS b, t2.v AS c
              |        FROM canon t1
              |        JOIN canon t2 ON t1.u = t2.u AND t1.v < t2.v
              |        JOIN canon t3 ON t3.u = t1.v AND t3.v = t2.v)
              |SELECT node, count(*) AS n_triangles
              |FROM (SELECT a AS node FROM tri
              |      UNION ALL SELECT b FROM tri
              |      UNION ALL SELECT c FROM tri) x
              |GROUP BY node
              |ORDER BY node""".stripMargin)),

    // ---- g12: link-prediction scores (the reference's end product) -----
    // RGD ranks candidate links by shared-neighbor evidence; g12 emits
    // the ranked scores: common-neighbor count plus the resource-
    // allocation and bit-length-discretized Adamic-Adar indices, all as
    // exact integer micro-units (no libm ln, no FP sum reordering — see
    // linkPredictionScores scaladoc). Degree-capped wedge like g09, so
    // the plan carries the same power-law fan-out bound.
    Q("g12_link_prediction",
      (s, dir) => linkPredictionScores(derivedEdges(s, dir), maxDegree = 8)
        .orderBy(col("u"), col("v")),
      Some(s"""$derivedSql,
              |sym AS (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon),
              |deg AS (SELECT dst AS w, count(*) AS deg FROM sym GROUP BY dst),
              |small AS (SELECT s.src, s.dst, deg.deg FROM sym s
              |          JOIN deg ON s.dst = deg.w WHERE deg.deg <= 8)
              |SELECT n1.src AS u, n2.src AS v, count(*) AS cn,
              |  CAST(sum(1000000 // n1.deg) AS BIGINT) AS ra_micro,
              |  CAST(sum(1000000 // length(format('{:b}', n1.deg))) AS BIGINT) AS aa_micro
              |FROM small n1 JOIN small n2 ON n1.dst = n2.dst
              |WHERE n1.src < n2.src
              |GROUP BY n1.src, n2.src
              |ORDER BY u, v""".stripMargin)),

    // ---- g09: degree-capped common neighbors ---------------------------
    // The registered form of the hub mitigation: wedge centers above the
    // degree cap are dropped BEFORE the wedge join, bounding its fan-out
    // at Σ min(deg, cap)² — the plan that survives a power-law graph at
    // 100× (ScaleSmoke measures it with cap 64 at 5M edges; g03 above
    // stays as the uncapped exact baseline). Cap 8 here, sized so it
    // actually filters the fixture graph (max degree 19 at sf0.01 —
    // a 64 cap would gate a no-op). The oracle applies the identical
    // degree filter in a CTE, so the cap's SEMANTICS are driver-gated,
    // not just its runtime.
    Q("g09_common_neighbors_capped",
      (s, dir) => commonNeighbors(derivedEdges(s, dir), minCommon = 1, maxDegree = 8)
        .orderBy(col("u"), col("v")),
      Some(s"""$derivedSql,
              |sym AS (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon),
              |deg AS (SELECT dst AS w, count(*) AS deg FROM sym GROUP BY dst),
              |small AS (SELECT s.src, s.dst FROM sym s
              |          JOIN deg ON s.dst = deg.w WHERE deg.deg <= 8)
              |SELECT n1.src AS u, n2.src AS v, count(*) AS cn
              |FROM small n1 JOIN small n2 ON n1.dst = n2.dst
              |WHERE n1.src < n2.src
              |GROUP BY n1.src, n2.src
              |HAVING count(*) >= 1
              |ORDER BY u, v""".stripMargin)),

    // ---- g10: recursive CTE (bounded walk counts) ----------------------
    // Spark 4's WITH RECURSIVE, exercised through the engine's SQL
    // surface: count the walks of length <= 3 from node 0 per end node.
    // Depth-bounded UNION ALL recursion is cycle-safe in both engines and
    // needs no engine-specific recursion knobs; the iterative OPERATOR
    // path for unbounded reachability remains connectedComponents (g07) —
    // this query pins the SQL feature itself.
    Q("g10_bounded_walks",
      (s, dir) => {
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql("""WITH RECURSIVE e AS (
                |  SELECT l_orderkey % 4000 AS src, l_partkey % 4000 AS dst
                |  FROM lineitem_v WHERE l_linenumber = 1),
                |canon AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
                |          FROM e WHERE src <> dst),
                |sym AS (SELECT u AS src, v AS dst FROM canon
                |        UNION ALL SELECT v, u FROM canon),
                |walk AS (
                |  SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
                |  UNION ALL
                |  SELECT s.dst AS node, w.depth + 1 AS depth
                |  FROM walk w JOIN sym s ON w.node = s.src
                |  WHERE w.depth < 3)
                |SELECT node, count(*) AS n_walks
                |FROM walk
                |GROUP BY node
                |ORDER BY node""".stripMargin('|'))
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT l_orderkey % 4000 AS src, l_partkey % 4000 AS dst
             |  FROM lineitem WHERE l_linenumber = 1),
             |canon AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
             |          FROM e WHERE src <> dst),
             |sym AS (SELECT u AS src, v AS dst FROM canon
             |        UNION ALL SELECT v, u FROM canon),
             |walk AS (
             |  SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
             |  UNION ALL
             |  SELECT s.dst AS node, w.depth + 1 AS depth
             |  FROM walk w JOIN sym s ON w.node = s.src
             |  WHERE w.depth < 3)
             |SELECT node, count(*) AS n_walks
             |FROM walk
             |GROUP BY node
             |ORDER BY node""".stripMargin)),

    // ---- g29: bounded walk counts as an aggregated frontier fold --------
    // The operator form of g10 (r12 verdict #5): identical semantics —
    // walks of length ≤ 3 from node 0, counted per end node — but the
    // state per hop is (node, count), bounded by the node set, instead
    // of the CTE's one-row-per-walk multiset (Σ deg³ rows). The oracle
    // is g10's recursive CTE verbatim: a green hash is the cross-engine
    // proof the count fold equals the walk enumeration. PlanSpec pins
    // the per-hop joins equi and the fold aggregated.
    Q("g29_bounded_walk_counts",
      (s, dir) => boundedWalkCounts(derivedEdges(s, dir), source = 0L, hops = 3)
        .orderBy(col("node")),
      Some("""WITH RECURSIVE e AS (
             |  SELECT l_orderkey % 4000 AS src, l_partkey % 4000 AS dst
             |  FROM lineitem WHERE l_linenumber = 1),
             |canon AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
             |          FROM e WHERE src <> dst),
             |sym AS (SELECT u AS src, v AS dst FROM canon
             |        UNION ALL SELECT v, u FROM canon),
             |walk AS (
             |  SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
             |  UNION ALL
             |  SELECT s.dst AS node, w.depth + 1 AS depth
             |  FROM walk w JOIN sym s ON w.node = s.src
             |  WHERE w.depth < 3)
             |SELECT node, count(*) AS n_walks
             |FROM walk
             |GROUP BY node
             |ORDER BY node""".stripMargin)),

    // ---- g14: local clustering coefficient -----------------------------
    // Exact integer micro-units (2e6·T/(d·(d−1)) via div) so both engines
    // hash-match; nodes below degree 2 have no defined coefficient and
    // are excluded on both sides. LEFT join keeps triangle-free nodes at
    // coefficient 0.
    Q("g14_clustering_coefficient",
      (s, dir) => clusteringCoefficient(derivedEdges(s, dir))
        .orderBy(col("node")),
      Some(s"""$derivedSql,
              |sym AS (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon),
              |deg AS (SELECT src AS node, count(*) AS degree FROM sym GROUP BY src),
              |tri AS (SELECT t1.u AS a, t1.v AS b, t2.v AS c
              |        FROM canon t1
              |        JOIN canon t2 ON t1.u = t2.u AND t1.v < t2.v
              |        JOIN canon t3 ON t3.u = t1.v AND t3.v = t2.v),
              |tc AS (SELECT node, count(*) AS n_triangles
              |       FROM (SELECT a AS node FROM tri
              |             UNION ALL SELECT b FROM tri
              |             UNION ALL SELECT c FROM tri) x
              |       GROUP BY node)
              |SELECT d.node, d.degree,
              |  CAST(coalesce(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
              |  CAST(2000000 * coalesce(tc.n_triangles, 0)
              |       // (d.degree * (d.degree - 1)) AS BIGINT) AS cc_micro
              |FROM deg d LEFT JOIN tc ON d.node = tc.node
              |WHERE d.degree >= 2
              |ORDER BY d.node""".stripMargin)),

    // ---- g15: whole-graph summary statistics ---------------------------
    // One row: transitivity in exact integer micro-units, assortativity
    // via the shared p10 formula text over HUGEINT sums — both engines
    // run identical arithmetic, never their own corr().
    Q("g15_graph_stats",
      (s, dir) => graphStats(derivedEdges(s, dir)),
      Some(s"""$derivedSql,
              |sym AS (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon),
              |deg AS (SELECT src AS node, count(*) AS degree FROM sym GROUP BY src),
              |tri AS (SELECT count(*) AS t
              |        FROM canon t1
              |        JOIN canon t2 ON t1.u = t2.u AND t1.v < t2.v
              |        JOIN canon t3 ON t3.u = t1.v AND t3.v = t2.v),
              |wn AS (SELECT CAST(sum(degree * (degree - 1) // 2) AS BIGINT) AS w,
              |              CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
              |ne AS (SELECT count(*) AS n_edges FROM canon),
              |dp AS (SELECT CAST(d1.degree AS HUGEINT) AS x,
              |              CAST(d2.degree AS HUGEINT) AS y
              |       FROM sym JOIN deg d1 ON sym.src = d1.node
              |                JOIN deg d2 ON sym.dst = d2.node),
              |a AS (SELECT count(*) AS n, sum(x) AS isx, sum(y) AS isy,
              |        sum(x*x) AS isxx, sum(y*y) AS isyy, sum(x*y) AS isxy
              |      FROM dp),
              |dd AS (SELECT CAST(n AS DOUBLE) AS nd,
              |        CAST(isx AS DOUBLE) AS sx, CAST(isy AS DOUBLE) AS sy,
              |        CAST(isxx AS DOUBLE) AS sxx, CAST(isyy AS DOUBLE) AS syy,
              |        CAST(isxy AS DOUBLE) AS sxy
              |       FROM a)
              |SELECT n_nodes, CAST(n_edges AS BIGINT) AS n_edges,
              |  CAST(t AS BIGINT) AS n_triangles,
              |  CAST(CAST(3000000 AS HUGEINT) * t // w AS BIGINT) AS transitivity_micro,
              |  round((${Profile.corrNum}) / (${Profile.corrDen}), 6) AS assortativity
              |FROM tri, wn, ne, dd""".stripMargin)),

    // ---- g08: log-binned degree distribution ---------------------------
    // The power-law profile that predicts wedge-join cost and degree-cap
    // thresholds before running them. Bin = floor(log2(degree)), computed
    // as binary-representation length minus one: FP log2 lands on
    // 2.9999... at exact powers of two and floors wrong, string length is
    // integer-exact in both engines.
    Q("g08_degree_histogram",
      (s, dir) => degrees(derivedEdges(s, dir))
        .select((length(expr("bin(degree)")) - 1).as("log2_bin"))
        .groupBy(col("log2_bin")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("log2_bin")),
      Some(s"""$derivedSql,
              |sym AS (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon),
              |deg AS (SELECT src, count(*) AS degree FROM sym GROUP BY src)
              |SELECT CAST(length(printf('%b', degree)) - 1 AS INT) AS log2_bin,
              |  count(*) AS n_nodes
              |FROM deg
              |GROUP BY 1
              |ORDER BY log2_bin""".stripMargin)),

    // ---- g11: k-core decomposition (iterative peeling) -----------------
    // The oracle unrolls 48 peeling rounds as a CTE chain — measured
    // convergence on the derived graph is ≤ 8 rounds across sf0.001/0.01/
    // 0.1 (k ∈ {2,3}; probed 2026-08-12), and a bootstrap-resampled fuzz
    // graph (tools/fuzz_oracle.py seed 1) blew through the old 16-round
    // margin and surfaced as a 55-vs-46-row gate mismatch — exactly the
    // loud failure the contract promises. The Spark side runs to the true
    // fixed point; a corpus needing more than 48 rounds still fails loud,
    // never silently wrong. The per-round CTEs are MATERIALIZED: DuckDB inlines
    // plain CTEs per reference, and each round references its
    // predecessor 3× — un-materialized, the chain expands 3^16 scans.
    Q("g11_kcore",
      (s, dir) => kCore(derivedEdges(s, dir), k = 2)._1.orderBy(col("node")),
      Some {
        val rounds = 48
        val roundSql = (1 to rounds).map { i =>
          s"""k$i AS MATERIALIZED (SELECT node
             |     FROM (SELECT u AS node FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1}) s$i
             |     GROUP BY node HAVING count(*) >= 2),
             |e$i AS MATERIALIZED (SELECT e.u, e.v FROM e${i - 1} e
             |     JOIN k$i a ON e.u = a.node JOIN k$i b ON e.v = b.node)""".stripMargin
        }.mkString(",\n")
        s"""$derivedSql,
           |e0 AS MATERIALIZED (SELECT u, v FROM canon),
           |$roundSql
           |SELECT node, count(*) AS core_degree
           |FROM (SELECT u AS node FROM e$rounds UNION ALL SELECT v FROM e$rounds) fin
           |GROUP BY node
           |ORDER BY node""".stripMargin
      }),

    // ---- g06: fixed-point PageRank (3 iterations, ppb longs) -----------
    // Integer arithmetic end-to-end, so the oracle unrolls the identical
    // three iterations and every rank matches exactly — no FP sum-order
    // hazard (see pageRankPpb scaladoc).
    Q("g06_pagerank",
      (s, dir) => pageRankPpb(derivedEdges(s, dir), iters = 3)
        .orderBy(col("node")),
      Some {
        val iterSql = (1 to 3).map { i =>
          s"""c$i AS (SELECT s.dst AS node, sum(r.r // d.deg) AS cs
             |     FROM sym s JOIN r${i - 1} r ON s.src = r.node
             |     JOIN deg d ON s.src = d.src GROUP BY s.dst),
             |r$i AS (SELECT node, (150000000 // n) + (85 * cs) // 100 AS r
             |     FROM c$i, nn)""".stripMargin
        }.mkString(",\n")
        s"""$derivedSql,
           |sym AS (SELECT u AS src, v AS dst FROM canon
           |        UNION ALL SELECT v, u FROM canon),
           |deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
           |nn AS (SELECT count(*) AS n FROM deg),
           |r0 AS (SELECT src AS node, 1000000000 // n AS r FROM deg, nn),
           |$iterSql
           |SELECT node, CAST(r AS BIGINT) AS rank_ppb FROM r3
           |ORDER BY node""".stripMargin
      }),

    // ---- g13: personalized PageRank (seeded proximity) -----------------
    // Seeds = nodes ≡ 0 (mod 100). The oracle unrolls the same integer
    // fixed point with the teleport FULL JOIN per iteration; // and div
    // agree (nonneg operands), so ranks hash-match bit-for-bit.
    Q("g13_personalized_pagerank",
      (s, dir) => personalizedPageRankPpb(derivedEdges(s, dir), seedMod = 100,
          iters = 3)
        .orderBy(col("node")),
      Some {
        val iterSql = (1 to 3).map { i =>
          s"""c$i AS (SELECT s.dst AS node, sum(r.r // d.deg) AS cs
             |     FROM sym s JOIN r${i - 1} r ON s.src = r.node
             |     JOIN deg d ON s.src = d.src GROUP BY s.dst),
             |r$i AS (SELECT coalesce(c.node, t.node) AS node,
             |     (CASE WHEN t.node IS NOT NULL THEN 150000000 // n ELSE 0 END)
             |       + 85 * coalesce(c.cs, 0) // 100 AS r
             |     FROM c$i c FULL JOIN seeds t ON c.node = t.node, ns)""".stripMargin
        }.mkString(",\n")
        s"""$derivedSql,
           |sym AS (SELECT u AS src, v AS dst FROM canon
           |        UNION ALL SELECT v, u FROM canon),
           |deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
           |seeds AS (SELECT DISTINCT src AS node FROM sym WHERE src % 100 = 0),
           |ns AS (SELECT count(*) AS n FROM seeds),
           |r0 AS (SELECT node, 1000000000 // n AS r FROM seeds, ns),
           |$iterSql
           |SELECT node, CAST(r AS BIGINT) AS rank_ppb FROM r3
           |ORDER BY node""".stripMargin
      }),

    // ---- g07: connected components (min-label fixed point) -------------
    // All-integer labels; the oracle runs ITERATIVE min-label propagation
    // with pointer doubling (graft.functions.ClosureSql — O((E+V)·rounds),
    // clique-size-independent, hostile-fuzz-safe), converging to the same
    // min-reachable-id the engine's propagation fixes.
    Q("g07_components",
      (s, dir) => connectedComponents(derivedEdges(s, dir))
        .orderBy(col("node")),
      Some(s"""$derivedSql,
              |sym AS MATERIALIZED (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon),
              |${graft.functions.ClosureSql.minLabelComp()}
              |SELECT node, c AS component FROM comp
              |ORDER BY node""".stripMargin)),

    // ---- g16: exact k-hop neighborhood function ------------------------
    // |B(v,2)| per node via frontier BFS over the distinct-pair closure.
    // The oracle's bounded recursion uses UNION (dedup), not UNION ALL:
    // the walk MULTISET within 2 hops is deg² per node, the reached SET
    // is what the neighborhood function counts.
    Q("g16_khop_reach",
      (s, dir) => khopReach(derivedEdges(s, dir), hops = 2)
        .orderBy(col("root")),
      Some("""WITH RECURSIVE e AS (
             |  SELECT l_orderkey % 4000 AS src, l_partkey % 4000 AS dst
             |  FROM lineitem WHERE l_linenumber = 1),
             |canon AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
             |          FROM e WHERE src <> dst),
             |sym AS (SELECT u AS src, v AS dst FROM canon
             |        UNION ALL SELECT v, u FROM canon),
             |r(root, node, d) AS (
             |  SELECT src, src, 0 FROM sym
             |  UNION
             |  SELECT r.root, s.dst, r.d + 1
             |  FROM r JOIN sym s ON r.node = s.src
             |  WHERE r.d < 2)
             |SELECT root, CAST(count(DISTINCT node) AS BIGINT) AS reach_n
             |FROM r GROUP BY root ORDER BY root""".stripMargin)),

    // ---- g17: HyperBall — sketched neighborhood function ---------------
    // Per-node HLL registers folded along edges (see hyperballReach
    // scaladoc); certified per node against the exact g16 closure. The
    // oracle rebuilds each node's registers from the closure SET (max
    // over a union == max over propagation folds) with the shared p14
    // register SQL and estimator text — a different algorithm arriving
    // at identical integers.
    Q("g17_hyperball",
      (s, dir) => hyperballReach(derivedEdges(s, dir), hops = 2),
      Some(s"""WITH RECURSIVE e AS (
             |  SELECT l_orderkey % 4000 AS src, l_partkey % 4000 AS dst
             |  FROM lineitem WHERE l_linenumber = 1),
             |canon AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
             |          FROM e WHERE src <> dst),
             |sym AS (SELECT u AS src, v AS dst FROM canon
             |        UNION ALL SELECT v, u FROM canon),
             |r(root, node, d) AS (
             |  SELECT src, src, 0 FROM sym
             |  UNION
             |  SELECT r.root, s.dst, r.d + 1
             |  FROM r JOIN sym s ON r.node = s.src
             |  WHERE r.d < 2),
             |pairs AS (SELECT DISTINCT root, node FROM r),
             |h AS (SELECT root,
             |    ${graft.functions.PortableHash.baseHashSql("CAST(node AS VARCHAR)")} AS h
             |  FROM pairs),
             |b AS (SELECT root, CAST(h >> 23 AS INT) AS bucket, h & 8388607 AS rr FROM h),
             |ro AS (SELECT root, bucket,
             |    CASE WHEN rr = 0 THEN 24
             |         ELSE 24 - length(format('{:b}', rr)) END AS rho FROM b),
             |regs AS (SELECT root, bucket, max(rho) AS m FROM ro GROUP BY root, bucket),
             |st AS (SELECT root, CAST(count(*) AS BIGINT) AS nonzero_registers,
             |    CAST(sum(1::BIGINT << (40 - m)) AS BIGINT) AS s_present
             |  FROM regs GROUP BY root),
             |tot AS (SELECT root, nonzero_registers,
             |    s_present + (512 - nonzero_registers) * (1::BIGINT << 40) AS s_total
             |  FROM st),
             |ex AS (SELECT root, CAST(count(DISTINCT node) AS BIGINT) AS n_exact
             |  FROM pairs GROUP BY root),
             |est AS (SELECT tot.root, n_exact, ${Profile.hllEstFormula(512)} AS est_reach,
             |    nonzero_registers
             |  FROM tot JOIN ex ON tot.root = ex.root)
             |SELECT root, n_exact, est_reach, nonzero_registers,
             |  CASE WHEN abs(est_reach - n_exact) * 100 <= greatest(500, 15 * n_exact)
             |       THEN 1 ELSE 0 END AS within_bound
             |FROM est ORDER BY root""".stripMargin)),

    // ---- g18–g21: the same operators on the power-law hub graph --------
    // (see skewedEdges). These rows are the gate the uniform mod-4000
    // graph can't provide: the hub's deg² wedge fan-out IS the reference
    // experiment, and the plans must survive it, not just the mild case.

    Q("g18_skew_triangles",
      (s, dir) => triangles(skewedEdges(s, dir))
        .orderBy(col("a"), col("b"), col("c")),
      Some(s"""$skewSql
              |SELECT t1.u AS a, t1.v AS b, t2.v AS c
              |FROM canon t1
              |JOIN canon t2 ON t1.u = t2.u AND t1.v < t2.v
              |JOIN canon t3 ON t3.u = t1.v AND t3.v = t2.v
              |ORDER BY a, b, c""".stripMargin)),

    // minCommon = 5 bounds the OUTPUT on the hub graph; the wedge join
    // underneath still pays the full deg(hub)² fan-out — that cost is
    // the point of the gate (the capped mitigation is g09's contract).
    Q("g19_skew_common_neighbors",
      (s, dir) => commonNeighbors(skewedEdges(s, dir), minCommon = 5)
        .orderBy(col("u"), col("v")),
      Some(s"""$skewSql,
              |sym AS (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon)
              |SELECT n1.src AS u, n2.src AS v, count(*) AS cn
              |FROM sym n1 JOIN sym n2 ON n1.dst = n2.dst
              |WHERE n1.src < n2.src
              |GROUP BY n1.src, n2.src
              |HAVING count(*) >= 5
              |ORDER BY u, v""".stripMargin)),

    Q("g20_skew_components",
      (s, dir) => connectedComponents(skewedEdges(s, dir))
        .orderBy(col("node")),
      Some(s"""$skewSql,
              |sym AS MATERIALIZED (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon),
              |${graft.functions.ClosureSql.minLabelComp()}
              |SELECT node, c AS component FROM comp
              |ORDER BY node""".stripMargin)),

    // ---- g25: maintained-degree-stats certificate (the knownStats
    // producer) — e02's fold-vs-whole pattern on the triangle chooser's
    // inputs: the canonical edge set splits 90/10 by edge hash, degrees
    // fold from the old table + the batch alone (foldDegrees), and the
    // output certifies (a) node-level fold == recompute mismatch-zero
    // (Spark computes it; the oracle pins 0), (b) the chooser statistics
    // (max, exact interpolated median ×10) derived from the MAINTAINED
    // table equal the oracle's from-scratch recompute, (c) the derived
    // plan decision itself. GraphOpsSpec additionally drives
    // trianglesAuto(knownStats = maintained) to identical triangles.
    Q("g25_degree_maintenance", { (s, dir) =>
        val canon = canonicalEdges(derivedEdges(s, dir))
        val isBatch = (graft.functions.PortableHash.baseHash(
          concat_ws(",", col("u").cast("string"), col("v").cast("string")))
          % 10) === 0
        val old = canon.filter(!isBatch).select(col("u").as("src"), col("v").as("dst"))
        val batch = canon.filter(isBatch).select(col("u").as("src"), col("v").as("dst"))
        val maintained = foldDegrees(degrees(old), batch)
        val recomputed = degrees(derivedEdges(s, dir))
        val mism = maintained
          .join(recomputed.withColumnRenamed("degree", "_w"), Seq("node"), "full")
          .agg(sum(when(col("degree") <=> col("_w"), 0L).otherwise(1L)).as("value"))
        val stats = maintained.agg(
          max(col("degree")).cast("long").as("mx"),
          round(expr("percentile(degree, 0.5)") * 10).cast("long").as("med10"))
        def row(name: String, v: DataFrame) =
          v.select(lit(name).as("metric"), col("value").cast("long").as("value"))
        row("chooser_degree_ordered", stats.select(
            (expr("mx div greatest(CAST(1 AS BIGINT), med10 div 10)") >= 10)
              .cast("long").as("value")))
          .unionByName(row("degree_fold_mismatch", mism))
          .unionByName(row("max_degree", stats.select(col("mx").as("value"))))
          .unionByName(row("median_degree_x10",
            stats.select(col("med10").as("value"))))
          .orderBy(col("metric"))
      },
      Some(s"""$derivedSql,
              |sym AS (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon),
              |deg AS (SELECT src AS node, count(*) AS degree FROM sym GROUP BY src),
              |st AS (SELECT max(degree) AS mx,
              |       CAST(round(quantile_cont(degree, 0.5) * 10) AS BIGINT) AS med10
              |       FROM deg)
              |SELECT 'chooser_degree_ordered' AS metric,
              |  CAST(mx // greatest(1, med10 // 10) >= 10 AS BIGINT) AS value FROM st
              |UNION ALL SELECT 'degree_fold_mismatch', 0
              |UNION ALL SELECT 'max_degree', CAST(mx AS BIGINT) FROM st
              |UNION ALL SELECT 'median_degree_x10', med10 FROM st
              |ORDER BY metric""".stripMargin)),

    // ---- g30: VERSIONED graph-state artifact (r14 verdict #8) ----------
    // g25's maintained degree table COMMITTED through the snapshot
    // protocol, closing the graph family's missing concurrent-probe /
    // pinned-read story: day 1 publishes the degree state as v1, day 2's
    // fold reads the COMMITTED v1 parquet (not a lineage replay),
    // CAS-publishes v2 against base v1, and consumers resolve the atomic
    // pointer — a probe racing the day-2 writer sees v1 or v2 whole,
    // never a half-written table. Certificate rows are g25's (fold ==
    // recompute mismatch pinned 0 cross-engine, chooser stats from the
    // COMMITTED live table) plus the d34-style adversarial pin:
    // `day1_degree_sum` reads the PINNED v1 through asOf after v2
    // published past it — v1's degree sum is exactly 2·|old edges| while
    // the live table's is 2·|all edges|, so any regression of asOf to
    // CURRENT-resolution breaks the hash whenever the batch is
    // non-empty, not just a spec. trianglesAuto(knownStats) reads the
    // same committed stats (GraphOpsSpec drives that path).
    Q("g30_versioned_degree_state", { (s, dir) =>
        import graft.sources.{VersionedTables => VT}
        val canon = canonicalEdges(derivedEdges(s, dir))
        val isBatch = (graft.functions.PortableHash.baseHash(
          concat_ws(",", col("u").cast("string"), col("v").cast("string")))
          % 10) === 0
        val old = canon.filter(!isBatch).select(col("u").as("src"), col("v").as("dst"))
        val batch = canon.filter(isBatch).select(col("u").as("src"), col("v").as("dst"))
        val root = graft.RunDirs.freshDir("g30").toString
        VT.publish(root, Seq("degrees" -> degrees(old)), base = None) // v1
        val pin = VT.liveVersion(root).get
        val day1 = VT.read(s, root, "degrees", degreesSchema)
        VT.publish(root, Seq("degrees" -> foldDegrees(day1, batch)),
          base = Some(pin)) // v2 — CURRENT moves past the pin
        val maintained = VT.read(s, root, "degrees", degreesSchema)
        val pinned = VT.read(s, root, "degrees", degreesSchema,
          asOf = Some(pin))
        val recomputed = degrees(derivedEdges(s, dir))
        val mism = maintained
          .join(recomputed.withColumnRenamed("degree", "_w"), Seq("node"), "full")
          .agg(sum(when(col("degree") <=> col("_w"), 0L).otherwise(1L)).as("value"))
        val stats = maintained.agg(
          max(col("degree")).cast("long").as("mx"),
          round(expr("percentile(degree, 0.5)") * 10).cast("long").as("med10"))
        def row(name: String, v: DataFrame) =
          v.select(lit(name).as("metric"), col("value").cast("long").as("value"))
        row("chooser_degree_ordered", stats.select(
            (expr("mx div greatest(CAST(1 AS BIGINT), med10 div 10)") >= 10)
              .cast("long").as("value")))
          .unionByName(row("day1_degree_sum",
            pinned.agg(sum(col("degree")).as("value"))))
          .unionByName(row("degree_fold_mismatch", mism))
          .unionByName(row("max_degree", stats.select(col("mx").as("value"))))
          .unionByName(row("median_degree_x10",
            stats.select(col("med10").as("value"))))
          .orderBy(col("metric"))
      },
      Some(s"""$derivedSql,
              |f AS (SELECT u, v,
              |  ${graft.functions.PortableHash.baseHashSql(
                   "u::VARCHAR || ',' || v::VARCHAR")} % 10 = 0 AS is_batch
              |  FROM canon),
              |sym AS (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon),
              |deg AS (SELECT src AS node, count(*) AS degree FROM sym GROUP BY src),
              |st AS (SELECT max(degree) AS mx,
              |       CAST(round(quantile_cont(degree, 0.5) * 10) AS BIGINT) AS med10
              |       FROM deg)
              |SELECT 'chooser_degree_ordered' AS metric,
              |  CAST(mx // greatest(1, med10 // 10) >= 10 AS BIGINT) AS value FROM st
              |UNION ALL SELECT 'day1_degree_sum',
              |  CAST(2 * count(*) AS BIGINT) FROM f WHERE NOT is_batch
              |UNION ALL SELECT 'degree_fold_mismatch', 0
              |UNION ALL SELECT 'max_degree', CAST(mx AS BIGINT) FROM st
              |UNION ALL SELECT 'median_degree_x10', med10 FROM st
              |ORDER BY metric""".stripMargin)),

    // ---- g26: incremental triangle maintenance (see [[triangleDelta]])
    // day-2 story (README.md:16-26 runs the workload on growing graphs;
    // the reference recomputes from scratch each day). Day-2 batch =
    // the g25 hash split; the triangle DELTA is computed WITHOUT
    // re-enumerating old triangles: for each new edge (u,v), count
    // closing vertices w whose two wing edges exist in old ∪ batch,
    // attributing each new triangle to its lexicographically-least
    // batch edge so triangles with 2 or 3 new edges count exactly once
    // (the wing conditions below). Cost is batch-edges × adjacency —
    // two equi-joins, never a day-1 re-enumeration; at 100 TB the day-2
    // batch is the small side and broadcasts. The certificate is
    // g25's fold==recompute shape: Spark folds day1 + delta and
    // subtracts a from-scratch recount (mismatch row), the oracle
    // recomputes both counts independently and pins mismatch 0 — a
    // double-counted 2-new-edge triangle or a missed wing hashes red.
    Q("g26_incremental_triangles", { (s, dir) =>
        val canon = canonicalEdges(derivedEdges(s, dir))
          .withColumn("is_batch", (graft.functions.PortableHash.baseHash(
            concat_ws(",", col("u").cast("string"), col("v").cast("string")))
            % 10) === 0)
        val old = canon.filter(!col("is_batch")).select(col("u"), col("v"))
        val one = trianglesFromCanonical(old)
          .agg(count(lit(1)).cast("long").as("t_old"))
          .crossJoin(broadcast(triangleDelta(canon)))
          .crossJoin(broadcast(trianglesFromCanonical(canon.select(col("u"), col("v")))
            .agg(count(lit(1)).cast("long").as("t_all"))))
        // stack() emits the 4 metric rows from ONE evaluation of the plan
        one.selectExpr("""stack(4,
            'delta_day2', delta,
            'fold_mismatch', t_old + delta - t_all,
            'triangles_day1', t_old,
            'triangles_total', t_old + delta) AS (metric, value)""")
          .orderBy(col("metric"))
      },
      Some(s"""$derivedSql,
              |f AS (SELECT u, v,
              |  ${graft.functions.PortableHash.baseHashSql(
                   "u::VARCHAR || ',' || v::VARCHAR")} % 10 = 0 AS is_batch
              |  FROM canon),
              |o AS (SELECT u, v FROM f WHERE NOT is_batch),
              |t_old AS (SELECT count(*) AS n FROM o t1
              |  JOIN o t2 ON t1.u = t2.u AND t1.v < t2.v
              |  JOIN o t3 ON t3.u = t1.v AND t3.v = t2.v),
              |t_all AS (SELECT count(*) AS n FROM canon t1
              |  JOIN canon t2 ON t1.u = t2.u AND t1.v < t2.v
              |  JOIN canon t3 ON t3.u = t1.v AND t3.v = t2.v)
              |SELECT 'delta_day2' AS metric,
              |  CAST(t_all.n - t_old.n AS BIGINT) AS value FROM t_all, t_old
              |UNION ALL SELECT 'fold_mismatch', 0
              |UNION ALL SELECT 'triangles_day1', CAST(n AS BIGINT) FROM t_old
              |UNION ALL SELECT 'triangles_total', CAST(n AS BIGINT) FROM t_all
              |ORDER BY metric""".stripMargin)),

    // ---- g27: incremental connected-component maintenance (see
    // [[foldComponents]]) — the labels sibling of g26: day-2 batch edges
    // contracted through day-1 labels, CC on the batch-bounded contracted
    // graph, relabel map joined back. Certificate: per-NODE fold ==
    // recompute mismatch (Spark computes it, oracle pins 0 — the
    // strongest form) plus day-1/day-2 component counts both engines
    // derive independently (oracle runs the iterative min-label chain
    // TWICE, namespaced, over the old and full edge sets).
    Q("g27_incremental_components", { (s, dir) =>
        val canon = canonicalEdges(derivedEdges(s, dir))
          .withColumn("is_batch", (graft.functions.PortableHash.baseHash(
            concat_ws(",", col("u").cast("string"), col("v").cast("string")))
            % 10) === 0)
        val old = canon.filter(!col("is_batch"))
          .select(col("u").as("src"), col("v").as("dst"))
        val batch = canon.filter(col("is_batch")).select(col("u"), col("v"))
        // The day-1+fold chain and the full recompute are INDEPENDENT
        // job trains (the fold never reads the recompute and vice
        // versa); both are driver-coordinated CC loops whose tiny
        // per-round jobs leave most cores idle. Overlapping them from
        // two driver threads (guide §2.6) lets the scheduler backfill
        // one loop's idle rounds with the other's — measured 10.1 s →
        // 7.2 s (−28%) at the cert tier. Results are unchanged:
        // each arm is the same deterministic fixed point, just
        // submitted from its own thread.
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val fFold = Future {
          val day1 = connectedComponents(old)
          (day1, foldComponents(day1, batch))
        }
        val fRecompute = Future {
          connectedComponents(canon
              .select(col("u").as("src"), col("v").as("dst")))
            .select(col("node"), col("component").as("rlabel"))
        }
        val (day1, folded) = Await.result(fFold, Duration.Inf)
        val recomputed = Await.result(fRecompute, Duration.Inf)
        val mism = folded.join(recomputed, Seq("node"), "full")
          .agg(sum(when(col("label") <=> col("rlabel"), 0L).otherwise(1L))
            .cast("long").as("mismatch"))
        val one = day1.agg(countDistinct(col("component")).cast("long")
            .as("c_day1"))
          .crossJoin(broadcast(folded
            .agg(countDistinct(col("label")).cast("long").as("c_day2"))))
          .crossJoin(broadcast(batch
            .agg(count(lit(1)).cast("long").as("b_edges"))))
          .crossJoin(broadcast(mism))
        one.selectExpr("""stack(4,
            'batch_edges', b_edges,
            'components_day1', c_day1,
            'components_day2', c_day2,
            'label_fold_mismatch', mismatch) AS (metric, value)""")
          .orderBy(col("metric"))
      },
      Some(s"""$derivedSql,
              |f AS (SELECT u, v,
              |  ${graft.functions.PortableHash.baseHashSql(
                   "u::VARCHAR || ',' || v::VARCHAR")} % 10 = 0 AS is_batch
              |  FROM canon),
              |oldsym AS MATERIALIZED (
              |  SELECT u AS src, v AS dst FROM f WHERE NOT is_batch
              |  UNION ALL SELECT v, u FROM f WHERE NOT is_batch),
              |sym AS MATERIALIZED (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon),
              |${graft.functions.ClosureSql.minLabelComp(24, "oldsym", "o_")},
              |${graft.functions.ClosureSql.minLabelComp(24, "sym")}
              |SELECT 'batch_edges' AS metric,
              |  CAST(count(*) AS BIGINT) AS value FROM f WHERE is_batch
              |UNION ALL SELECT 'components_day1', CAST(count(DISTINCT c)
              |  AS BIGINT) FROM o_comp
              |UNION ALL SELECT 'components_day2', CAST(count(DISTINCT c)
              |  AS BIGINT) FROM comp
              |UNION ALL SELECT 'label_fold_mismatch', 0
              |ORDER BY metric""".stripMargin)),

    // ---- g28: WARM-START PageRank maintenance ---------------------------
    // The ranks sibling of g25/g26/g27: day-1 trains 3 cold rounds, the
    // g26 batch split grows the graph, and day 2 resumes the integer
    // fixed point FROM yesterday's ranks — 2 warm rounds on the grown
    // graph instead of a fresh cold schedule. The oracle unrolls BOTH
    // phases (day-1 r1..r3 over the old graph, then w1..w2 over the full
    // graph warm-initialized via LEFT JOIN with uniform fill for new
    // nodes), so every output rank matches bit-for-bit; GraphOpsSpec
    // proves warm-with-uniform == cold and measures the convergence win.
    Q("g28_incremental_pagerank", { (s, dir) =>
        val canon = canonicalEdges(derivedEdges(s, dir))
          .withColumn("is_batch", (graft.functions.PortableHash.baseHash(
            concat_ws(",", col("u").cast("string"), col("v").cast("string")))
            % 10) === 0)
        val old = canon.filter(!col("is_batch"))
          .select(col("u").as("src"), col("v").as("dst"))
        val ranks1 = pageRankPpb(old, iters = 3)
        pageRankPpbFrom(
            canon.select(col("u").as("src"), col("v").as("dst")),
            ranks1, iters = 2)
          .orderBy(col("node"))
      },
      Some {
        def rounds(k: Int, sym: String, deg: String, nn: String,
            prev: String, out: String): String =
          (1 to k).map { i =>
            val p = if (i == 1) prev else s"$out${i - 1}"
            s"""${out}c$i AS (SELECT s.dst AS node, sum(r.r // d.deg) AS cs
               |     FROM $sym s JOIN $p r ON s.src = r.node
               |     JOIN $deg d ON s.src = d.src GROUP BY s.dst),
               |$out$i AS (SELECT node, (150000000 // n) + (85 * cs) // 100 AS r
               |     FROM ${out}c$i, $nn)""".stripMargin
          }.mkString(",\n")
        s"""$derivedSql,
           |f AS (SELECT u, v,
           |  ${graft.functions.PortableHash.baseHashSql(
                "u::VARCHAR || ',' || v::VARCHAR")} % 10 = 0 AS is_batch
           |  FROM canon),
           |o AS (SELECT u, v FROM f WHERE NOT is_batch),
           |sym1 AS (SELECT u AS src, v AS dst FROM o
           |         UNION ALL SELECT v, u FROM o),
           |deg1 AS (SELECT src, count(*) AS deg FROM sym1 GROUP BY src),
           |nn1 AS (SELECT count(*) AS n FROM deg1),
           |r0 AS (SELECT src AS node, 1000000000 // n AS r FROM deg1, nn1),
           |${rounds(3, "sym1", "deg1", "nn1", "r0", "r")},
           |sym2 AS (SELECT u AS src, v AS dst FROM canon
           |         UNION ALL SELECT v, u FROM canon),
           |deg2 AS (SELECT src, count(*) AS deg FROM sym2 GROUP BY src),
           |nn2 AS (SELECT count(*) AS n FROM deg2),
           |w0 AS (SELECT d.src AS node, coalesce(r3.r, 1000000000 // n) AS r
           |       FROM deg2 d CROSS JOIN nn2 LEFT JOIN r3 ON r3.node = d.src),
           |${rounds(2, "sym2", "deg2", "nn2", "w0", "w")}
           |SELECT node, CAST(r AS BIGINT) AS rank_ppb FROM w2
           |ORDER BY node""".stripMargin
      }),

    // g22: the degree-cap mitigation on the SAME hub graph g19 pays full
    // price on — cap 64 drops wedges through the 691-degree hub (and only
    // through genuinely hubby centers; the fixture median is 3), so the
    // bench shows blowup and mitigation side by side on one graph and the
    // oracle certifies the cap's SEMANTICS with an identical degree-filter
    // CTE (the g09 pattern, now where the cap actually matters).
    Q("g22_skew_capped_neighbors",
      (s, dir) => commonNeighbors(skewedEdges(s, dir), minCommon = 5, maxDegree = 64)
        .orderBy(col("u"), col("v")),
      Some(s"""$skewSql,
              |sym AS (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon),
              |deg AS (SELECT dst AS w, count(*) AS deg FROM sym GROUP BY dst),
              |small AS (SELECT s.src, s.dst FROM sym s
              |          JOIN deg ON s.dst = deg.w WHERE deg.deg <= 64)
              |SELECT n1.src AS u, n2.src AS v, count(*) AS cn
              |FROM small n1 JOIN small n2 ON n1.dst = n2.dst
              |WHERE n1.src < n2.src
              |GROUP BY n1.src, n2.src
              |HAVING count(*) >= 5
              |ORDER BY u, v""".stripMargin)),

    // g23: the EXACT mitigation of g18's hub blowup — same triangles,
    // degree-ordered wedge generation (see trianglesDegreeOrdered). The
    // oracle re-derives the orientation independently with DuckDB row
    // comparison, so the green row certifies both the orientation and
    // that the forward algorithm loses no triangle on the hub graph.
    Q("g23_skew_triangles_ordered",
      (s, dir) => trianglesDegreeOrdered(skewedEdges(s, dir))
        .orderBy(col("a"), col("b"), col("c")),
      Some(s"""$skewSql,
              |sym AS (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon),
              |deg AS (SELECT src AS n, count(*) AS d FROM sym GROUP BY src),
              |o AS (SELECT
              |    CASE WHEN (du.d, c.u) < (dv.d, c.v) THEN c.u ELSE c.v END AS s,
              |    CASE WHEN (du.d, c.u) < (dv.d, c.v) THEN c.v ELSE c.u END AS t,
              |    CASE WHEN (du.d, c.u) < (dv.d, c.v) THEN dv.d ELSE du.d END AS dt
              |  FROM canon c
              |  JOIN deg du ON c.u = du.n
              |  JOIN deg dv ON c.v = dv.n),
              |w AS (SELECT o1.s, o1.t AS t1, o2.t AS t2
              |  FROM o o1 JOIN o o2 ON o1.s = o2.s
              |  WHERE (o1.dt, o1.t) < (o2.dt, o2.t)),
              |tri AS (SELECT w.s, w.t1, w.t2 FROM w
              |  WHERE EXISTS (SELECT 1 FROM o WHERE o.s = w.t1 AND o.t = w.t2))
              |SELECT least(s, t1, t2) AS a,
              |  greatest(least(s, t1), least(greatest(s, t1), t2)) AS b,
              |  greatest(s, t1, t2) AS c
              |FROM tri
              |ORDER BY a, b, c""".stripMargin)),

    // ---- g24: DOULION sampled triangle estimate on the hub graph -------
    // Registered on the SKEWED graph, where approximation earns its keep:
    // when even g23's exact O(m^1.5) orientation is too big, the p=1/5
    // hash-coin sample cuts wedge volume 25×. The oracle replays the
    // identical md5 coin and triangle join, so the gate certifies the
    // whole estimator (sample membership + count + scaling), not just a
    // number; GraphOpsSpec measures the estimate against g18's exact
    // count for the error story.
    Q("g24_skew_sampled_triangles",
      (s, dir) => sampledTriangles(skewedEdges(s, dir)),
      Some(s"""$skewSql,
              |samp AS (SELECT u, v FROM canon
              |  WHERE ${graft.functions.PortableHash
                  .baseHashSql("u::VARCHAR || '|' || v::VARCHAR")} % 5 = 0)
              |SELECT (SELECT CAST(count(*) AS BIGINT) FROM canon) AS edges_total,
              |  (SELECT CAST(count(*) AS BIGINT) FROM samp) AS edges_sampled,
              |  CAST(t.c AS BIGINT) AS tri_sampled,
              |  CAST(t.c * 125 AS BIGINT) AS tri_est
              |FROM (SELECT count(*) AS c
              |      FROM samp t1 JOIN samp t2 ON t1.u = t2.u AND t1.v < t2.v
              |      JOIN samp t3 ON t3.u = t1.v AND t3.v = t2.v) t""".stripMargin)),

    // ---- g21: the skew itself, oracle-certified ------------------------
    // One summary row: node count, max and exact-median distinct degree,
    // and their integer ratio. The gate holding means the graph the
    // g18–g20 plans survived really is hub-skewed (ratio ≥ 100 is also
    // asserted in GraphOpsSpec). The collect_list is over ≤ 4000 degree
    // values — a broadcast-shaped summary, not a data-scale sort.
    Q("g21_skew_degree_stats",
      (s, dir) => degrees(skewedEdges(s, dir))
        .agg(count(lit(1)).as("n_nodes"), max(col("degree")).as("max_degree"),
          sort_array(collect_list(col("degree"))).as("sorted"))
        .select(col("n_nodes"), col("max_degree"),
          expr("element_at(sorted, CAST(floor((n_nodes + 1) / 2) AS INT))").as("median_degree"))
        .select(col("n_nodes"), col("max_degree"), col("median_degree"),
          expr("max_degree div median_degree").as("skew_ratio")),
      Some(s"""$skewSql,
              |sym AS (SELECT u AS src, v AS dst FROM canon
              |        UNION ALL SELECT v, u FROM canon),
              |deg AS (SELECT src AS node, count(*) AS degree FROM sym GROUP BY src),
              |r AS (SELECT degree,
              |    row_number() OVER (ORDER BY degree) AS rn,
              |    count(*) OVER () AS n FROM deg)
              |SELECT CAST(max(n) AS BIGINT) AS n_nodes,
              |  CAST(max(degree) AS BIGINT) AS max_degree,
              |  max(CASE WHEN rn = CAST(floor((n + 1) / 2) AS BIGINT)
              |      THEN CAST(degree AS BIGINT) END) AS median_degree,
              |  CAST(max(degree) AS BIGINT)
              |    // max(CASE WHEN rn = CAST(floor((n + 1) / 2) AS BIGINT)
              |           THEN CAST(degree AS BIGINT) END) AS skew_ratio
              |FROM r""".stripMargin)),
  )
}
