package graft

/** Plan-inspection entry: `runMain graft.Explain <sfDir> [query ...]`
  * prints `explain("formatted")` for the named queries (default: a
  * representative set). Used to keep plans honest: pushed filters, pruned
  * scan schemas, broadcast joins where expected, wide WholeStageCodegen
  * spans. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
    else Seq("q01_agg", "q02_filter_project", "q03_join_agg", "q05_multi_join",
      "g01_triangles", "d05_embedding_neardup", "s01_cosine_topk")
    val spark = GraftSession.get(master = "local[4]", shufflePartitions = 4,
      appName = "graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
