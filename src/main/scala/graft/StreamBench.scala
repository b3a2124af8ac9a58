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
  * Usage: `runMain graft.StreamBench [sfDir] [nFiles] [xFactor]` (defaults
  * /root/testdata/sf0.1, 20 files, 1×). `xFactor` replays the corpus at a
  * MULTIPLIED offered rate: the events table is replicated xFactor times
  * with disjoint (event_id, user_id) ranges — independent user
  * populations, so per-key state and join output scale linearly with the
  * rate, exactly like real added traffic (duplicating ids instead would
  * square the per-user join volume and measure a different query). Same
  * nFiles ⇒ each trigger ingests xFactor× the rows; at sfDir=sf0.1 and
  * xFactor=10 that is the 1M-event tier (the streaming analogue of
  * ScaleSmoke's 10–50× batch tier, BASELINE_SELF.md records it).
  */
object StreamBench {

  private def quantile(xs: Seq[Long], q: Double): Long =
    if (xs.isEmpty) -1L
    else xs.sorted.apply(math.min(xs.size - 1, (q * xs.size).toInt))

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(20)
    val xFactor = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = GraftSession.get(appName = "graft-stream-bench")
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.silenceBoundedWindowWarning() // after the level reset

    // stage the replay: nFiles roughly equal parquet chunks
    val evBase = Tables.load(spark, sfDir, "events")
    val ev =
      if (xFactor <= 1) evBase
      else {
        // Replicas must carry DISJOINT id ranges ("disjoint user
        // populations" premise) — derive the stride from the corpus's own
        // max id instead of a fixed 1e9 that a larger sf dir could
        // silently overflow into a superlinear self-join.
        // coalesce: on an EMPTY events table both maxes aggregate to
        // NULL and getLong would NPE (r10 ADVICE) — 0 keeps the fixed
        // 1e9 stride, the pre-r10 behavior.
        val mx = evBase.agg(coalesce(
            greatest(max(col("event_id")), max(col("user_id"))), lit(0L)))
          .head().getLong(0)
        val stride = math.max(1000000000L, mx + 1)
        (0 until xFactor).map { r =>
          evBase.select((col("event_id") + lit(r * stride)).as("event_id"),
            col("ts"), (col("user_id") + lit(r * stride)).as("user_id"),
            col("event_type"), col("value"), col("props"))
        }.reduce(_ unionByName _)
      }
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
      println(s"""{"query":"$name","x_factor":$xFactor,"batches":${lats.size},"rows":$rows,""" +
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

    // st10: ingest-disorder audit under a FAITHFUL arrival-ordered
    // replay. Unlike st01/st05 (count-checked), the audit's VALUES
    // depend on cross-batch arrival order, so the plain staged chunks
    // (arbitrary row placement) would not reproduce the batch result.
    // Chunks are cut along the audit's own arrival key and moved into
    // the watch directory one by one — ascending modification times
    // give FileStreamSource the deterministic batch order a real
    // ingest has — and the cross-check is full CONTENT equality of the
    // final per-user audit rows, the strongest stream==batch claim in
    // this bench.
    {
      import org.apache.spark.sql.expressions.Window
      val replayDir = Files.createTempDirectory("graft_replay_arrival")
      val arr = unix_micros(col("ts")) +
        pmod(graft.functions.PortableHash.baseHash(col("event_id").cast("string")),
          lit(3600L)) * 1000000L
      // chunk assignment by RANGE PARTITIONING on the arrival key, not
      // `ntile() OVER (ORDER BY …)`: the global window would single-task-
      // sort the whole corpus inside the HARNESS while measuring the
      // engine (r8 verdict #3). Partition i holds arrival keys strictly
      // below partition i+1's, which is all the replay needs — chunk
      // sizes are approximately (not exactly) equal, irrelevant to the
      // stream==batch check. persist() pins the sampled range boundaries
      // so the per-chunk filters below all see ONE assignment.
      val ordered = spark.read.parquet(staging)
        .repartitionByRange(nFiles, arr, col("event_id"))
        .withColumn("_b", spark_partition_id() + 1)
        .persist()
      for (i <- 1 to nFiles) {
        val tmp = Files.createTempDirectory("graft_replay_chunk").toString
        ordered.filter(col("_b") === i).drop("_b")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.move(part.toPath, replayDir.resolve(f"chunk-$i%04d.parquet"))
      }
      ordered.unpersist()
      val stream = spark.readStream
        .schema(spark.read.parquet(staging).schema)
        .option("maxFilesPerTrigger", 1).parquet(replayDir.toString)
      val q = EventStreams.disorderAudit(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("bench_audit").start()
      try q.processAllAvailable() finally q.stop()
      // append mode emits one cumulative row per touched user per batch;
      // the final audit per user is the one with the largest n_events
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("n_events").desc, col("max_disorder_s").desc)
      val finalRows = spark.table("bench_audit")
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
      val batch = EventStreams.disorderAudit(spark.read.parquet(staging))
      val matched = finalRows.intersect(batch).count()
      report("st10_disorder_audit_ordered_replay", q, matched, batch.count())
    }

    // st11: stream-stream LEFT OUTER interval join (attribution). Outer
    // NULL rows emit only as the watermark passes each click's window
    // close, so this measures join-state maintenance under steady
    // triggers. Three replay requirements the inner-count benches above
    // don't have: (a) chunks must arrive in EVENT-TIME order (the st10
    // device) — randomly-placed rows behind an advanced watermark are
    // LATE and silently dropped from join state, which undercounts the
    // outer side ~10× (measured on the unordered staging); (b) a
    // sentinel event past the corpus arrives last to flush the tail's
    // pending NULL rows (the StreamingSpec device); (c) the sentinel
    // must be one row PER JOIN SIDE: Catalyst pushes the event_type
    // filters below the EventTimeWatermark node (they don't touch ts),
    // so each side's watermark only advances on rows surviving its own
    // filter — a neither-type sentinel is invisible and the global
    // watermark (= min across sides) stalls one watermark-delay +
    // join-window short of the corpus max, permanently stranding the
    // tail's unmatched clicks in state (measured: 70 rows at sf0.1).
    // With all three, stream == batch exactly.
    {
      import org.apache.spark.sql.expressions.Window
      val replayDir = Files.createTempDirectory("graft_replay_attr")
      val maxTs = spark.read.parquet(staging)
        .agg(max(col("ts"))).head.getTimestamp(0)
      // the sentinels ride INSIDE the final chunk (not as a 21st file,
      // which FileStreamSource may list in the same batch): with them the
      // last data batch advances both sides' watermarks past every window
      // close and the engine's trailing no-data batch evicts + emits the
      // pending NULL rows. user_id = -1 keeps them out of every real
      // join key; the streamed count excludes them.
      val sentinel = spark.createDataFrame(Seq(
          (-1L, new java.sql.Timestamp(maxTs.getTime + 86400000L), -1L,
            "click", 0.0, "{}"),
          (-2L, new java.sql.Timestamp(maxTs.getTime + 86400000L), -1L,
            "purchase", 0.0, "{}")))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      // range-partitioned chunk staging, same rationale as st10's
      val ordered = spark.read.parquet(staging)
        .repartitionByRange(nFiles, col("ts"), col("event_id"))
        .withColumn("_b", spark_partition_id() + 1)
        .persist()
      for (i <- 1 to nFiles) {
        val tmp = Files.createTempDirectory("graft_attr_chunk").toString
        val chunk = ordered.filter(col("_b") === i).drop("_b")
        (if (i == nFiles) chunk.unionByName(sentinel) else chunk)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.move(part.toPath, replayDir.resolve(f"chunk-$i%04d.parquet"))
      }
      ordered.unpersist()
      val stream = spark.readStream
        .schema(spark.read.parquet(staging).schema)
        .option("maxFilesPerTrigger", 1).parquet(replayDir.toString)
      val q = EventStreams.intervalJoinOuter(stream.withWatermark("ts", "2 hours"))
        .writeStream.outputMode("append")
        .format("memory").queryName("bench_attr").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table("bench_attr")
        .filter(col("user_id") >= 0).count()
      val batch = EventStreams.intervalJoinOuter(
        spark.read.parquet(staging)).count()
      report("st11_attribution_outer_join", q, streamed, batch)
    }

    // st13: live HLL register maintenance — the 512-row sketch artifact
    // folded across micro-batches. Registers are a max monoid (order- and
    // slicing-invariant), so content equality with the batch build holds
    // under ANY replay order — no ordered-chunk device needed; the
    // cross-check is full register-table equality, and the latency is the
    // per-trigger cost of keeping corpus reach live.
    {
      val stream = spark.readStream
        .schema(spark.read.parquet(staging).schema)
        .option("maxFilesPerTrigger", 1).parquet(staging)
      val q = graft.operators.Profile.hllRegisters(stream, col("user_id"))
        .writeStream.outputMode("complete")
        .format("memory").queryName("bench_hll").start()
      try q.processAllAvailable() finally q.stop()
      val batch = graft.operators.Profile.hllRegisters(
        spark.read.parquet(staging), col("user_id"))
      val matched = spark.table("bench_hll").intersect(batch).count()
      report("st13_sketch_registers", q, matched, batch.count())
    }

    spark.stop()
  }
}
