package graft

import graft.operators.GraphOps
import graft.sources.EdgeList

/** Config-sweep benchmark grid — the engine's replacement for the
  * reference's experiment harness (`target/automate.sh:4-12`, which swept
  * 10 edge-list datasets × 5 executor-memory configs on YARN).
  *
  * Memory per executor is not a runtime-settable knob in a shared JVM, so
  * the sweep covers the three knobs that shape a Spark plan at scale and
  * ARE runtime-settable per run:
  *   - `spark.sql.shuffle.partitions` — reduce-side width
  *   - `spark.sql.files.maxPartitionBytes` — scan split size (the
  *     reference's `mapred.max.split.size` in its modern form)
  *   - `spark.sql.autoBroadcastJoinThreshold` — broadcast vs shuffle join
  *
  * Workload per cell: canonical-edge triangle enumeration (the reference's
  * one pipeline) over each input file. One JSON line per cell with
  * wall-clock and shuffle read/write bytes; grand-total line last. Results
  * are recorded in SWEEP.md.
  *
  * Usage: `runMain graft.SweepBench [edgeFile ...]`
  */
object SweepBench {

  private val shufflePartitions = Seq(8, 32, 128)
  private val maxPartitionBytes = Seq(1L << 20, 16L << 20, 128L << 20)
  private val broadcastThreshold = Seq(-1L, 64L << 20)

  def main(args: Array[String]): Unit = {
    val files = if (args.nonEmpty) args.toSeq
    else Seq("10k", "20k", "50k", "100k")
      .map(n => s"/root/reference/src/main/resources/$n.txt")
    val spark = GraftSession.get(appName = "graft-sweep")
    val totals = ShuffleTotals.install(spark)
    spark.range(1000).selectExpr("sum(id)").collect() // warmup

    val t0 = System.nanoTime()
    for {
      sp <- shufflePartitions
      mpb <- maxPartitionBytes
      bt <- broadcastThreshold
    } {
      spark.conf.set("spark.sql.shuffle.partitions", sp.toString)
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb.toString)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bt.toString)
      files.foreach { f =>
        val (r0, w0) = totals.snapshotAfter()
        val start = System.nanoTime()
        val canon = GraphOps.canonicalEdges(EdgeList.read(spark, f)).persist()
        val n = GraphOps.trianglesFromCanonical(canon).count()
        val sec = (System.nanoTime() - start) / 1e9
        canon.unpersist()
        val (r1, w1) = totals.snapshotAfter()
        val file = f.split('/').last
        println(s"""{"file":"$file","shuffle_partitions":$sp,"max_partition_bytes":$mpb,"broadcast_threshold":$bt,"triangles":$n,"sec":$sec,"shuffle_read":${r1 - r0},"shuffle_write":${w1 - w0}}""")
      }
    }
    println(s"""{"metric":"sweep_total","value":${(System.nanoTime() - t0) / 1e9},"unit":"sec","cells":${shufflePartitions.size * maxPartitionBytes.size * broadcastThreshold.size * files.size}}""")
    spark.stop()
  }
}
