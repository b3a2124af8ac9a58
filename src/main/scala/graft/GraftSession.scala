package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Designed for both local testing (`local[32]`) and a real multi-executor
  * cluster: every conf here is a cluster-safe default, not a local-only hack.
  * The reference tuned scan parallelism per dataset by hand
  * (`mapreducePredictionTwitter100.java:20` — `mapred.max.split.size` scaled
  * with input size to hold ~147 splits); we let AQE coalesce/split partitions
  * at runtime instead, which is the scale-portable version of that knob.
  */
object GraftSession {

  /** Build (or reuse) a session with graft defaults. */
  def get(master: String = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"),
          shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32").toInt,
          appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    silenceBoundedWindowWarning()
    graft.plans.GraftFunctions.register(spark)
    installRules(spark)
    spark
  }

  /** Apply graft defaults to an externally-built session (e.g. the driver's). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    silenceBoundedWindowWarning()
    graft.plans.GraftFunctions.register(spark)
    installRules(spark)
    spark
  }

  /** Silence WindowExec's "No Partition Defined" scale warning.
    *
    * Adjudicated (r8 verdict #1): every unpartitioned window in this
    * engine is a DELIBERATE global running sum over a table bounded by
    * construction — budgetSelect's per-shuffle-partition offsets (≤
    * `parts` rows), distributionRanks' group offsets with no group
    * columns (same bound), and the HDR cumulative counts (≤ MaxBuckets
    * rows). Single-partition execution there is the design; the
    * per-execution warning flood (dozens per bench run) buried real
    * warnings in the artifact tail. A constant `partitionBy(lit(0))` key
    * does NOT suppress it — Catalyst constant-folds foldable partition
    * expressions out of the spec and the executed Window is unpartitioned
    * again (measured) — so the logger is scoped down instead: exactly
    * this one class, everything else stays at WARN. An ACCIDENTAL
    * corpus-sized global window would still be caught — PlanSpec pins
    * the two-pass ranked shapes on q36/q51/d22/e04 and t13 asserts the
    * windowless threshold select.
    *
    * Also scoped down: MapPartitionsRDD's "locally checkpointed …
    * cannot be recomputed after unpersisting" note, emitted by the
    * ContextCleaner when it GCs a localCheckpointed table. Every
    * localCheckpoint here is a deliberate materialization barrier whose
    * blocks are never needed after the queries that read them complete
    * (each call site documents why) — 76 identical copies of that note
    * per bench run were the other half of the tail flood. */
  private[graft] def silenceBoundedWindowWarning(): Unit = {
    // Message-specific DENY filters, not level scoping (r9 ADVICE): a
    // blanket ERROR level on these loggers would also swallow a future
    // ACCIDENTAL corpus-sized unpartitioned window or any OTHER warning
    // those classes emit. The filters match exactly the two known-benign
    // flood messages; everything else still reaches the appender at WARN.
    denyLoggerMessage("org.apache.spark.sql.execution.window.WindowExec",
      "(?s).*No Partition Defined for Window operation.*")
    denyLoggerMessage("org.apache.spark.rdd.MapPartitionsRDD",
      "(?s).*was locally checkpointed, its lineage has been truncated.*")
  }

  /** Attach a DENY [[org.apache.logging.log4j.core.filter.RegexFilter]]
    * for `pattern` to `loggerName`'s LoggerConfig (created additive at the
    * ancestor's level if the logger has no explicit config). Idempotent:
    * an exact-name config that already carries a filter is left alone —
    * safe because this method is the only filter writer in the process.
    * Spark's `setLogLevel` (Configurator.setAllLevels) rewrites LEVELS on
    * existing configs but never removes filters, so the deny survives the
    * mains' level resets; call sites still re-apply defensively. */
  private def denyLoggerMessage(loggerName: String, pattern: String): Unit = {
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.{Filter, LoggerContext}
    import org.apache.logging.log4j.core.config.LoggerConfig
    import org.apache.logging.log4j.core.filter.RegexFilter
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val conf = ctx.getConfiguration
    val nearest = conf.getLoggerConfig(loggerName)
    val lc =
      if (nearest.getName == loggerName) nearest
      else {
        val fresh = new LoggerConfig(loggerName, nearest.getLevel, true)
        conf.addLogger(loggerName, fresh)
        fresh
      }
    if (lc.getFilter == null) {
      lc.addFilter(RegexFilter.createFilter(pattern, null, java.lang.Boolean.FALSE,
        Filter.Result.DENY, Filter.Result.NEUTRAL))
      ctx.updateLoggers()
    }
  }

  /** Install graft optimizer rules on a LIVE session (new sessions can use
    * `spark.sql.extensions=graft.plans.GraftExtensions` instead). */
  private def installRules(spark: SparkSession): Unit = {
    val rules = spark.experimental.extraOptimizations
    if (!rules.contains(graft.plans.RewriteHofDotProduct))
      spark.experimental.extraOptimizations =
        rules :+ graft.plans.RewriteHofDotProduct
  }
}
