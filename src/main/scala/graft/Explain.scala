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
    val spark = GraftSession.get(master = "local[4]", shufflePartitions = 4,
      appName = "graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (executed) {
        df.count()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
