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
    graft.plans.GraftFunctions.register(spark)
    installRules(spark)
    spark
  }

  /** Apply graft defaults to an externally-built session (e.g. the driver's). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    graft.plans.GraftFunctions.register(spark)
    installRules(spark)
    spark
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
