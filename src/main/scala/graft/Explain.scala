package graft

/** Plan-inspection entry: `runMain graft.Explain <sfDir> [--executed] [query ...]`
  * prints `explain("formatted")` for the named queries (default: a
  * representative set). With `--executed`, runs each query first and
  * prints the final AQE plan — the one that shows runtime decisions
  * (ReusedExchange, coalesced partitions, skew splits). Used to keep
  * plans honest: pushed filters, pruned scan schemas, broadcast joins
  * where expected, wide WholeStageCodegen spans. */
object Explain {
  def main(args: Array[String]): Unit = {
    val executed = args.contains("--executed")
    val rest = args.filterNot(_ == "--executed")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (rest.length > 1) rest.drop(1).toSeq
    else Seq("q01_agg", "q02_filter_project", "q03_join_agg", "q05_multi_join",
      "g01_triangles", "d05_embedding_neardup", "s01_cosine_topk")
    // default small; a bench-shaped session (local[32], 32 shuffle
    // partitions) via SPARK_GRAFT_EXPLAIN_CPUS when the dump's evidence
    // is AQE's runtime partition decisions, not just plan shape
    val cpus = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_CPUS", "4").toInt
    val spark = GraftSession.get(master = s"local[$cpus]",
      shufflePartitions = cpus, appName = "graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (executed) {
        // drive THIS DataFrame's own query execution (df.count() would
        // plan a separate count query and leave this one un-finalized,
        // printing `isFinalPlan=false` with no AQEShuffleRead evidence);
        // toRdd.count() materializes every output column, the Bench rule
        df.queryExecution.toRdd.count()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
