package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import java.nio.file.Files

/** Streaming latency bench: rate-limited file replay of the `events`
  * table through the windowed (st01) and stateful (st05) operators,
  * reporting per-micro-batch trigger latency (BASELINE_SELF.md records
  * results).
  *
  * The replay stages events into `nFiles` parquet chunks and streams
  * them with `maxFilesPerTrigger = 1` — each micro-batch ingests one
  * chunk, so the offered rate is (rows/nFiles) per trigger and the
  * numbers measure steady-state trigger execution, not one giant batch.
  * Latencies come from the engine's own `StreamingQueryProgress`
  * (triggerExecution duration), the same metric a production monitor
  * watches. Each run also cross-checks the streamed result against the
  * batch run of the same operator on the same rows — the stream==batch
  * contract StreamingSpec proves at sf0.001, re-proven here at replay
  * scale as a row-count match.
  *
  * Usage: `runMain graft.StreamBench [sfDir] [nFiles]` (defaults
  * /root/testdata/sf0.1, 20 files).
  */
object StreamBench {

  private def quantile(xs: Seq[Long], q: Double): Long =
    if (xs.isEmpty) -1L
    else xs.sorted.apply(math.min(xs.size - 1, (q * xs.size).toInt))

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = GraftSession.get(appName = "graft-stream-bench")
    spark.sparkContext.setLogLevel("WARN")

    // stage the replay: nFiles roughly equal parquet chunks
    val ev = Tables.load(spark, sfDir, "events")
    val nRows = ev.count()
    val staging = Files.createTempDirectory("graft_stream_replay").toString
    ev.repartition(nFiles).write.mode("overwrite").parquet(staging)

    def report(name: String, q: StreamingQuery, streamedRows: Long,
        batchRows: Long): Unit = {
      val trig = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .map(p => (p.numInputRows,
          Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(-1L)))
      val lats = trig.map(_._2).filter(_ >= 0)
      val rows = trig.map(_._1).sum
      val totalSec = lats.sum / 1000.0
      println(s"""{"query":"$name","batches":${lats.size},"rows":$rows,""" +
        s""""median_trigger_ms":${quantile(lats, 0.5)},""" +
        s""""p95_trigger_ms":${quantile(lats, 0.95)},""" +
        s""""max_trigger_ms":${lats.max},""" +
        s""""rows_per_sec":${math.round(rows / math.max(totalSec, 1e-9))},""" +
        s""""stream_rows":$streamedRows,"batch_rows":$batchRows,""" +
        s""""stream_eq_batch":${streamedRows == batchRows}}""")
    }

    // st01: watermarked tumbling-window aggregation, complete mode
    {
      val stream = spark.readStream
        .schema(spark.read.parquet(staging).schema)
        .option("maxFilesPerTrigger", 1).parquet(staging)
      val q = EventStreams.hourlyByType(stream.withWatermark("ts", "2 hours"))
        .writeStream.outputMode("complete")
        .format("memory").queryName("bench_hourly").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table("bench_hourly").agg(sum(col("n"))).head.getLong(0)
      report("st01_window_hourly", q, streamed, nRows)
    }

    // st05: stateful per-user threshold alerts, append mode
    {
      val stream = spark.readStream
        .schema(spark.read.parquet(staging).schema)
        .option("maxFilesPerTrigger", 1).parquet(staging)
      val q = EventStreams.thresholdAlerts(stream).toDF()
        .writeStream.outputMode("append")
        .format("memory").queryName("bench_alerts").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table("bench_alerts").count()
      val batch = EventStreams.thresholdAlerts(
        spark.read.parquet(staging)).count()
      report("st05_threshold_alerts", q, streamed, batch)
    }

    spark.stop()
  }
}
