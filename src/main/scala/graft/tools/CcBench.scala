package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Controlled A/B for the star-CC per-round checkpoint mode —
  * `runMain graft.tools.CcBench [sfDir] [reps]`.
  *
  * Suite-level bench runs proved too noisy to decide this (the d02-class
  * 1–3 s queries swing 2× between idle runs on JIT/scheduler state), so
  * this harness interleaves EAGER and LAZY rounds inside one JVM on the
  * same warmed code paths: per rep, one timed CC run per mode on the g07
  * graph and one on the g20 skew graph, alternating. Prints per-mode
  * medians — the number OPTIMIZATION_r16.md cites for keeping or
  * reverting the lazy-checkpoint convergence piggyback.
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val uniform = li.filter(col("l_linenumber") === 1)
      .select((col("l_orderkey") % 4000).as("src"),
        (col("l_partkey") % 4000).as("dst"))
    val skew = li.filter(col("l_linenumber") === 1)
      .selectExpr(
        "((l_orderkey * 2654435761) % 1000000) AS mo",
        "((l_partkey * 2654435761) % 1000000) AS mp")
      .selectExpr(
        "(mo*mo*mo) div 250000000000000 AS src",
        "(mp*mp*mp) div 250000000000000 AS dst")
    import graft.operators.GraphOps
    def run(eager: Boolean, edges: org.apache.spark.sql.DataFrame): Double = {
      GraphOps.ccEagerCheckpoint = eager
      val t0 = System.nanoTime()
      GraphOps.connectedComponentsStar(edges)._1.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both modes and both graphs
    run(eager = true, uniform); run(eager = false, uniform)
    run(eager = true, skew); run(eager = false, skew)
    val res = scala.collection.mutable.Map
      .empty[(String, Boolean), List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to reps; (gname, g) <- Seq("uniform" -> uniform, "skew" -> skew);
         eager <- Seq(true, false)) {
      res((gname, eager)) :+= run(eager, g)
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    val out = for (g <- Seq("uniform", "skew"); e <- Seq(true, false)) yield {
      val xs = res((g, e))
      f""""$g-${if (e) "eager" else "lazy"}":{"median":${med(xs)}%.3f,"all":[${xs.map(x => f"$x%.3f").mkString(",")}]}"""
    }
    GraphOps.ccEagerCheckpoint = false // restore the production default
    spark.stop()
    println(out.mkString("{", ",", "}"))
  }
}
