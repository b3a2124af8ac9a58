package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Process-wide shuffle read/write byte totals from task metrics.
  *
  * Wall-clock at sf0.1 doesn't predict cost at 100× data — shuffle volume
  * does, so every bench main records it (BASELINE.md's "v0 action").
  * Snapshot deltas around a query attribute its bytes; listener delivery
  * is asynchronous, so [[snapshotAfter]] drains the listener bus
  * (deterministic, unlike a fixed sleep under ambient load) before
  * reading.
  */
final class ShuffleTotals(sc: org.apache.spark.SparkContext) extends SparkListener {
  private val read = new AtomicLong
  private val written = new AtomicLong

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  def snapshot(): (Long, Long) = (read.get(), written.get())

  def snapshotAfter(): (Long, Long) = {
    // waitUntilEmpty throws TimeoutException after 10 s if the bus stays
    // busy; stale-by-a-beat byte counts beat aborting a whole bench run
    try org.apache.spark.graft.ListenerBusHook.waitUntilEmpty(sc)
    catch { case _: java.util.concurrent.TimeoutException => () }
    snapshot()
  }
}

object ShuffleTotals {
  /** Install a fresh listener on the session's context. */
  def install(spark: SparkSession): ShuffleTotals = {
    val t = new ShuffleTotals(spark.sparkContext)
    spark.sparkContext.addSparkListener(t)
    t
  }
}
