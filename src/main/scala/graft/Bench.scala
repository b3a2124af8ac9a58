package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Protocol (pinned so round-over-round deltas are comparable):
  *   - hash protocol pinned in-process (md5 — the oracle protocol) via
  *     [[graft.functions.PortableHash.pin]]; timings never depend on
  *     ambient `GRAFT_FAST_HASH`.
  *   - the bench REFUSES to start while the box is busy: it polls
  *     /proc/loadavg until 1-min load ≤ `SPARK_GRAFT_BENCH_MAXLOAD`
  *     (default 4.0) for up to `SPARK_GRAFT_BENCH_MAXWAIT` seconds
  *     (default 900), and records start/end load in the artifact. A
  *     committed number measured under contention is an artifact lie
  *     (d05 was once recorded at 53 s vs 3.2 s idle).
  *   - global warmup (JVM/codegen/parquet-footer caches), then
  *     `SPARK_GRAFT_BENCH_SUITES` (default 2) full passes over the
  *     registry; within each pass a query gets `SPARK_GRAFT_BENCH_RUNS`
  *     (default 3) timed runs (plus one untimed warmup in the first
  *     pass), and the reported seconds are the MIN over passes of the
  *     per-pass MEDIAN (r14 verdict #2: three consecutive rounds of
  *     headlines qualified at the load-gate boundary carried a one-query
  *     transient smear — r14's g20 read 21.9 s in the artifact vs
  *     1.8–2.9 s in three sibling idle runs, because a within-pass
  *     transient smears all three back-to-back runs together; two
  *     passes separated by the full suite's wall are what the
  *     min-of-medians needs to shed it). Per-pass medians and loads are
  *     recorded in the artifact, so a disagreement between passes is
  *     machine-visible.
  *   - FULL-OUTPUT evaluation ([[exec]]): each run materializes every
  *     output column and any terminal sort, never a stacked `.count()`
  *     that Catalyst can prune projections / eliminate joins / drop
  *     sorts through — the number is what a real consumer of the
  *     query's output pays.
  *   - quadratic CERTIFICATION arms (exact all-pairs / exact k-hop:
  *     d05, d18, g16) run against the sf0.01 cert tier
  *     (`SPARK_GRAFT_SF_DIR_CERT`): their O(n²) at sf0.1 predicts
  *     nothing that sf0.01 doesn't, and they were 40% of bench wall.
  *     The subquadratic scale forms (d20, s02/s05, g17) stay at sf0.1.
  *     The artifact records which queries ran at the cert tier.
  *   - shuffle read/write bytes per query, via a `SparkListener` over
  *     task metrics, deltas snapshotted around the LAST timed run —
  *     bytes are deterministic per run, unlike time; at 100× data,
  *     shuffle bytes predict cost.
  *   - a query that throws reports `-1` time plus its error class+message
  *     under `"errors"`, and the process exits 1: a broken query can never
  *     masquerade as a fast one.
  *
  * Artifact protocol: the FULL record (every registered query + shuffle bytes)
  * goes to `BENCH_SELF.json`; stdout gets a COMPACT line (headline
  * queries only, < 2000 chars) printed LAST, after `spark.stop()` —
  * the driver tail-captures the final 2000 chars of output, and the
  * full 11 KB line can never survive that window (BENCH_r04–r06 all
  * carried `parsed: null` because of it).
  */
object Bench {

  /** Exact/quadratic certification arms benched at the cert tier.
    * g17 is here because its registered query EMBEDS the exact g16
    * closure as its per-node certification arm; the scale-safe register
    * fold alone is measured at 5M edges in ScaleSmoke. d25 is the
    * hostile mass-duplication certification of the capped keeper: its
    * banded candidate stage is quadratic in the planted clique BY
    * CONSTRUCTION (that is what it certifies), so its sf0.1 cost
    * predicts nothing sf0.01 doesn't — the keeper's scale evidence is
    * ScaleSmoke --d23-only at 500k. */
  private val certTierQueries = Set(
    "d05_embedding_neardup", "d18_semantic_clusters", "g16_khop_reach",
    "g17_hyperball", "d25_semantic_representatives_hostile",
    // g27's fold==recompute certificate runs CC TWICE by construction
    // (10.4 s at sf0.1 vs g07's 3.9 s single run) — the recompute arm is
    // certification cost, not operator cost, so it certifies at sf0.01
    "g27_incremental_components")

  /** Headline subset for the compact stdout line: the per-family
    * most-expensive queries plus everything the round gates watch. */
  private val headline = Set(
    "q01_agg", "q41_bucketed_join", "g01_triangles", "g07_components",
    "g16_khop_reach", "g17_hyperball", "d01_exact_dedup", "d02_minhash_lsh",
    "d05_embedding_neardup", "d13_prefix_jaccard", "d18_semantic_clusters",
    "d20_semantic_clusters_banded", "s01_cosine_topk", "s05_ivf_topk",
    "t05_tfidf", "p07_quantile_sketch", "p13_mad_outliers",
    "st04_stream_dedup", "m06_phash_neardup", "e01_corpus_build")

  /** (1-min, 5-min) load averages. BOTH matter for qualification: after
    * a long job train the 1-min figure dips under the threshold minutes
    * before the box is genuinely quiet, and a bench started in that dip
    * still runs smeared (the round-13 re-gate measured 248.7 s "idle"
    * at load1 0.28 / load5 3.2 vs the true 182.0 s — every p-series
    * query uniformly ~2×). */
  private def loadAvg(): (Double, Double) =
    try {
      val f = scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")
      (f(0).toDouble, f(1).toDouble)
    } catch { case _: Throwable => (-1.0, -1.0) }

  /** Evaluate the query's FULL output, not `df.count()`: stacking a
    * count aggregate on top lets Catalyst prune the final projections
    * and eliminate unique-key left joins, so a `.count()`-based bench
    * times less than any real consumer pays (d12's long-standing
    * 0.155 s line never evaluated its shingle probe — the count of its
    * terminal left join derives from the left side alone). Counting the
    * exec RDD materializes every output column (UnsafeRow projection)
    * while still never collecting rows to the driver. */
  private def exec(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    graft.functions.PortableHash.pin(fast = false) // md5: the oracle protocol
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val certDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR_CERT",
      if (sfDir.contains("sf0.1")) sfDir.replace("sf0.1", "sf0.01") else sfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // Default gate is ARTIFACT-strength (r9 verdict #7): BENCH_r9 was
    // recorded at load 2.5 and carried ~16 s of contention noise that
    // read as phantom d-series regressions. The driver runs this main
    // with no env, so the default must protect the artifact; a dev loop
    // that would rather start dirty than wait opts out via the env.
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXLOAD", "1.0").toDouble
    val maxWait = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXWAIT", "1800").toInt
    // comma-separated query-name filter for iterating on one line of the
    // bench without paying for the whole suite; empty = all
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    // HEADLINE qualification (r12 verdict #7): the r12 headline artifact
    // was measured at load 0.96 and carried ~38 s of pure ambient smear —
    // cost a judge-round of phantom-regression forensics. True idle runs
    // on this box show load ≤ 0.1, so the wait loop now targets the
    // headline threshold (0.3), and an artifact recorded above it is
    // SELF-TAGGED "loaded-floors-only": still valid for the 2x floor
    // gates (smear inflates, never deflates), never for round-over-round
    // headline comparison. The tag rides in the JSON, so a reader can
    // never mistake a contaminated total for a regression.
    val headlineMax =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_HEADLINE_MAXLOAD", "0.3").toDouble
    // the 5-min average must ALSO have decayed: a recently-busy box
    // passes the 1-min dip long before it passes this. 0.6 (r13 verdict
    // #9 — tightened from 1.0): the r13 headline qualified at load5 0.98
    // and still carried +8% ambient smear over the true-idle ledger, so
    // "no more than one core's worth over five minutes" is not quiet
    // enough for a comparable headline; true idle runs on this box show
    // load5 well under 0.5
    val headline5Max =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_HEADLINE_MAXLOAD5", "0.6").toDouble
    // full suite passes; per-query value = min over passes of the
    // per-pass median (r14 verdict #2). A filtered dev run keeps one
    // pass: the min-of-passes rule protects the COMMITTED artifact.
    val suites = sys.env.getOrElse("SPARK_GRAFT_BENCH_SUITES",
      if (only.isEmpty) "2" else "1").toInt
    require(suites >= 1, s"SPARK_GRAFT_BENCH_SUITES must be >= 1 (got $suites)")

    def quiet(l: (Double, Double)) = l._1 <= headlineMax && l._2 <= headline5Max
    def waitForQuiet(): (Double, Double) = {
      val waitStart = System.nanoTime()
      var load = loadAvg()
      while (!quiet(load) && (System.nanoTime() - waitStart) / 1e9 < maxWait) {
        System.err.println(f"bench: load ${load._1}%.1f/5m ${load._2}%.1f > headline $headlineMax%.1f/$headline5Max%.1f, waiting for idle box...")
        Thread.sleep(15000)
        load = loadAvg()
      }
      load
    }
    val (loadAtStart, load5AtStart) = waitForQuiet()
    if (loadAtStart > maxLoad)
      System.err.println(f"bench: WARNING — starting under load $loadAtStart%.1f; timings suspect")
    else if (!quiet((loadAtStart, load5AtStart)))
      System.err.println(f"bench: load $loadAtStart%.1f/5m $load5AtStart%.1f — artifact will be tagged loaded-floors-only")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // AFTER setLogLevel: Spark's level reset wipes per-logger overrides
    GraftSession.silenceBoundedWindowWarning()
    val totals = ShuffleTotals.install(spark)

    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    } catch { case _: Throwable => () }

    var failed = List.empty[(String, String)]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    def runSuite(first: Boolean): Seq[(String, Double, Long, Long, Double, Double)] =
      selected.map { case (name, fn) =>
        val dir = if (certTierQueries(name)) certDir else sfDir
        try {
          if (first) exec(fn(spark, dir)) // untimed warmup (pass 1 only)
          val times = (1 to runs).map { i =>
            if (i == runs) {
              val (r0, w0) = totals.snapshotAfter()
              val t0 = System.nanoTime()
              exec(fn(spark, dir))
              val sec = (System.nanoTime() - t0) / 1e9
              val (r1, w1) = totals.snapshotAfter()
              (sec, r1 - r0, w1 - w0)
            } else {
              val t0 = System.nanoTime()
              exec(fn(spark, dir))
              ((System.nanoTime() - t0) / 1e9, 0L, 0L)
            }
          }
          val sorted = times.map(_._1).sorted
          val median = sorted.apply(runs / 2)
          val (_, rd, wr) = times.last
          (name, median, rd, wr, sorted.head, sorted.last)
        } catch {
          case e: Throwable =>
            if (!failed.exists(_._1 == name))
              failed ::= (name, s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
            (name, -1.0, 0L, 0L, -1.0, -1.0)
        }
      }
    // each pass re-qualifies the box. Pass 1 gates on BOTH load fields
    // (the bench-start criterion); later passes gate on load1 ONLY: the
    // 5-min average is self-inflated for ~15 minutes after a full pass
    // (it is measuring the bench's own compute), so waiting it out would
    // burn idle wall to learn nothing, while load1 decays in ~2-3
    // minutes and still catches FOREIGN load arriving between passes.
    // The min-of-medians then shields pass-2 values measured under the
    // residual self-load — pass 1 was idle-qualified for those queries.
    def waitForLoad1(): (Double, Double) = {
      val waitStart = System.nanoTime()
      var load = loadAvg()
      while (load._1 > headlineMax &&
          (System.nanoTime() - waitStart) / 1e9 < maxWait) {
        Thread.sleep(15000)
        load = loadAvg()
      }
      load
    }
    var suiteLoads = List.empty[(Double, Double)]
    var suitesOk = true
    val bySuite = (1 to suites).map { si =>
      val l =
        if (si == 1) (loadAtStart, load5AtStart)
        else waitForLoad1()
      suiteLoads :+= l
      // an unreadable /proc/loadavg reports (-1,-1): that must DISQUALIFY
      // (no measurement is not a quiet measurement), though the wait
      // loops treat it as non-blocking
      val ok =
        if (si == 1) l._1 >= 0 && l._2 >= 0 && quiet(l)
        else l._1 >= 0 && l._1 <= headlineMax
      if (!ok) suitesOk = false
      runSuite(first = si == 1)
    }
    // per-query: min over passes of the per-pass median; shuffle bytes
    // from the first pass that ran it cleanly (bytes are deterministic);
    // spread across ALL timed runs of all passes
    val results = selected.indices.map { i =>
      val rs = bySuite.map(_(i))
      val name = rs.head._1
      val ok = rs.filter(_._2 >= 0)
      if (ok.isEmpty) (name, -1.0, 0L, 0L, -1.0, -1.0)
      else {
        val best = ok.minBy(_._2)
        val mn = ok.map(_._5).min
        val mx = ok.map(_._6).max
        (name, best._2, ok.head._3, ok.head._4, mn, mx)
      }
    }
    val loadAtEnd = loadAvg()

    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", " ")
    def num(v: Double) = if (v < 0) "-1" else f"$v%.3f"
    val qs = results.map { case (k, v, _, _, _, _) => s"\"$k\":${num(v)}" }.mkString("{", ",", "}")
    val sh = results.map { case (k, _, r, w, _, _) =>
      s"""\"$k\":{\"read\":$r,\"write\":$w}""" }.mkString("{", ",", "}")
    // per-query [min, median, max] across the `runs` timed passes — the
    // r10 verdict's ask: sub-second driver-coordinated queries swing 2-6x
    // on scheduling noise while the total stays flat; the spread makes a
    // phantom regression machine-visible instead of a judge-round of
    // forensics.
    val spread = results.map { case (k, _, _, _, mn, mx) =>
      s"\"$k\":[${num(mn)},${num(mx)}]" }.mkString("{", ",", "}")
    // the compact stdout line gets only the OUTLIERS (max/min > 2), count
    // capped so the driver's 2000-char tail capture never truncates
    val outliers = results
      .filter { case (_, _, _, _, mn, mx) => mn > 0 && mx / mn > 2.0 }
      .sortBy { case (_, _, _, _, mn, mx) => -(mx / mn) }
      .take(12)
      .map { case (k, _, _, _, mn, mx) => f"\"$k\":${mx / mn}%.1f" }
      .mkString("{", ",", "}")
    val errs = failed.map { case (k, m) => s"\"$k\":\"${esc(m)}\"" }.mkString("{", ",", "}")
    val certQs = results.collect { case (k, _, _, _, _, _) if certTierQueries(k) => s"\"$k\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // EVERY pass must have started qualified (pass 1 on both fields,
    // later passes on load1 — see the pass loop) — a pass that began
    // under foreign load would otherwise launder its smear into the min
    val headlineOk = suitesOk
    val loadTag = if (headlineOk) "idle" else "loaded-floors-only"
    val suiteLoadsJson = suiteLoads
      .map(l => f"[${l._1}%.2f,${l._2}%.2f]").mkString("[", ",", "]")
    val suiteTotals = bySuite
      .map(rs => num(rs.map(_._2).filter(_ >= 0).sum)).mkString("[", ",", "]")
    val suiteMedians = bySuite.map { rs =>
      rs.map { case (k, v, _, _, _, _) => s"\"$k\":${num(v)}" }
        .mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    val meta = s""""unit":"sec","runs":$runs,"suites":$suites,""" +
      s""""stat":"min_of_suite_medians","errors":$errs,""" +
      s""""cert_sf":"$certDir","cert_queries":$certQs,""" +
      s""""headline_ok":$headlineOk,"load_tag":"$loadTag",""" +
      s""""suite_loads":$suiteLoadsJson,"suite_totals":$suiteTotals,""" +
      f""""load_start":$loadAtStart%.2f,"load5_start":$load5AtStart%.2f,""" +
      f""""load_end":${loadAtEnd._1}%.2f,"sf":"$sfDir""""
    val fullLine = s"""{"metric":"total","value":${num(total)},$meta,"queries":$qs,"spread_min_max":$spread,"shuffle_bytes":$sh,"suite_medians":$suiteMedians}"""
    // the full record is the committed artifact...
    if (only.isEmpty) {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SELF.json"),
        (fullLine + "\n").getBytes("UTF-8"))
    }
    // a filtered dev run reports everything it ran — the headline cut
    // only matters for the full suite's 2000-char stdout budget
    val hl = results.filter { case (k, _, _, _, _, _) =>
      only.nonEmpty || headline(k) }
      .map { case (k, v, _, _, _, _) => s"\"$k\":${num(v)}" }.mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${num(total)},$meta,""" +
      s""""queries":$hl,"spread_outliers":$outliers,""" +
      s""""queries_all":${results.size},"full":"BENCH_SELF.json"}"""
    spark.stop()
    // ...and the compact line goes LAST on stdout so the driver's
    // 2000-char tail capture always contains one complete JSON record
    println(compact)
    if (failed.nonEmpty) sys.exit(1)
  }
}
