package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Protocol (pinned so round-over-round deltas are comparable):
  *   - global warmup (JVM/codegen/parquet-footer caches), then per query
  *     one untimed warmup run + `SPARK_GRAFT_BENCH_RUNS` (default 3) timed
  *     runs; the reported seconds are the MEDIAN. Ambient load on the
  *     bench box showed ±70% single-run variance — medians of repeated
  *     runs are the cheapest stable estimator.
  *   - shuffle read/write bytes per query (BASELINE.md's "v0 action"
  *     promised wall-clock + shuffle volume: at 100× data, shuffle bytes
  *     predict cost; sf0.1 wall-clock doesn't). Collected via a
  *     `SparkListener` over task metrics, deltas snapshotted around the
  *     LAST timed run — bytes are deterministic per run, unlike time.
  *   - a query that throws reports `-1` time plus its error class+message
  *     under `"errors"`, and the process exits 1: a broken query can never
  *     masquerade as a fast one.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // comma-separated query-name filter for iterating on one line of the
    // bench without paying for the whole suite; empty = all
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val totals = ShuffleTotals.install(spark)

    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    } catch { case _: Throwable => () }

    var failed = List.empty[(String, String)]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      try {
        fn(spark, sfDir).count() // untimed warmup
        val times = (1 to runs).map { i =>
          if (i == runs) {
            val (r0, w0) = totals.snapshotAfter()
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            val sec = (System.nanoTime() - t0) / 1e9
            val (r1, w1) = totals.snapshotAfter()
            (sec, r1 - r0, w1 - w0)
          } else {
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            ((System.nanoTime() - t0) / 1e9, 0L, 0L)
          }
        }
        val median = times.map(_._1).sorted.apply(runs / 2)
        val (_, rd, wr) = times.last
        (name, median, rd, wr)
      } catch {
        case e: Throwable =>
          failed ::= (name, s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
          (name, -1.0, 0L, 0L)
      }
    }

    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", " ")
    val qs = results.map { case (k, v, _, _) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val sh = results.map { case (k, _, r, w) =>
      s"""\"$k\":{\"read\":$r,\"write\":$w}""" }.mkString("{", ",", "}")
    val errs = failed.map { case (k, m) => s"\"$k\":\"${esc(m)}\"" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"stat":"median","queries":$qs,"shuffle_bytes":$sh,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // the driver's tail-capture truncates stdout (BENCH_r0*.json carried
    // "parsed": null for three rounds) — persist the full record too, but
    // only for whole-suite runs so a filtered dev run can't shadow a real one
    if (only.isEmpty) {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SELF.json"),
        (line + "\n").getBytes("UTF-8"))
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
