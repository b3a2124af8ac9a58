package graft

import graft.operators.GraphOps
import graft.sources.EdgeList

/** Self-measured baseline for the reference workload (BASELINE.md "v0
  * action"): time triangle enumeration over the reference's bundled edge
  * files and print one JSON line per file. These numbers are the floor all
  * future BENCH comparisons use, since the reference repo records none. */
object GraphBench {
  def main(args: Array[String]): Unit = {
    val files = if (args.nonEmpty) args.toSeq
    else Seq("50", "10k", "20k", "50k", "100k")
      .map(n => s"/root/reference/src/main/resources/$n.txt")
    val spark = GraftSession.get(appName = "graft-graph-bench")
    val totals = ShuffleTotals.install(spark)
    // warm-up
    spark.range(1000).selectExpr("sum(id)").collect()
    files.foreach { f =>
      val (r0, w0) = totals.snapshotAfter()
      val t0 = System.nanoTime()
      // persist the canonical edge set: the triangle join references it
      // with three different keys, so it would otherwise be recomputed
      // (input re-scanned) three times
      val canon = GraphOps.canonicalEdges(EdgeList.read(spark, f)).persist()
      val n = GraphOps.trianglesFromCanonical(canon).count()
      val sec = (System.nanoTime() - t0) / 1e9
      canon.unpersist()
      val (r1, w1) = totals.snapshotAfter()
      println(s"""{"file":"$f","triangles":$n,"sec":$sec,"shuffle_read":${r1 - r0},"shuffle_write":${w1 - w0}}""")
      // the degree-ordered form on the same file: identical count, the
      // orientation that survives hub skew (see trianglesDegreeOrdered)
      val t1 = System.nanoTime()
      val nOrd = GraphOps.trianglesDegreeOrdered(EdgeList.read(spark, f)).count()
      val secOrd = (System.nanoTime() - t1) / 1e9
      val (r2, w2) = totals.snapshotAfter()
      println(s"""{"file":"$f","variant":"degree_ordered","triangles":$nOrd,"sec":$secOrd,"shuffle_read":${r2 - r1},"shuffle_write":${w2 - w1}}""")
    }
    spark.stop()
  }
}
