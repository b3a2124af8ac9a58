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
    // warm-up
    spark.range(1000).selectExpr("sum(id)").collect()
    files.foreach { f =>
      val t0 = System.nanoTime()
      val n = GraphOps.triangles(EdgeList.read(spark, f)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"file":"$f","triangles":$n,"sec":$sec}""")
    }
    spark.stop()
  }
}
