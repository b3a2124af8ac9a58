package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Job-count contracts for the r16 job-diet optimizations (r15 verdict
  * #1/#5): driver-coordinated loops pay a fixed scheduling latency per
  * Spark JOB, so the per-round job count is the thing the lazy-checkpoint
  * convergence piggyback actually changed — these pins keep it from
  * regressing. Counts are taken with a plain job-start listener; AQE means
  * one action can submit several stage-materialization jobs, so the pins
  * are calibrated against measured values with one job of headroom, and
  * the CC pin uses a SLOPE (jobs added per extra round, via two inputs
  * with different round counts) so session-setup noise cancels out. */
class JobsPerRoundSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.get

  private def jobsDuring[T](body: => T): (T, Long) = {
    val counter = new java.util.concurrent.atomic.AtomicLong
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      Thread.sleep(500) // listener bus posts asynchronously
      (r, counter.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def pathEdges(n: Int) = {
    import spark.implicits._
    (0L until n.toLong - 1).map(i => (i, i + 1)).toDF("src", "dst")
  }

  test("star CC: lazy checkpoint saves one job per round vs the eager mode") {
    import graft.operators.GraphOps
    // The r16 contract (r15 verdict #1): the convergence aggregate is the
    // round's materializing action, so the eager-checkpoint mode's extra
    // per-round count job is gone — jobs(eager) − jobs(lazy) ≈ rounds.
    // Measured with the in-repo toggle so the pin is self-calibrating
    // against AQE's per-stage job accounting (≈11 stage jobs per round
    // on this session — the eager delta is the signal, not the total).
    val edges = pathEdges(4096)
    GraphOps.connectedComponentsStar(edges)._1.count() // warm
    val prior = GraphOps.ccEagerCheckpoint
    try {
      GraphOps.ccEagerCheckpoint = true
      val ((_, rEager), jEager) =
        jobsDuring(GraphOps.connectedComponentsStar(edges))
      GraphOps.ccEagerCheckpoint = false
      val ((_, rLazy), jLazy) =
        jobsDuring(GraphOps.connectedComponentsStar(edges))
      assert(rEager === rLazy, "modes must converge in the same rounds")
      assert(jLazy <= jEager - rLazy + 2,
        s"lazy checkpoint no longer saves the per-round materialization job: " +
          s"eager $jEager vs lazy $jLazy over $rLazy rounds")
    } finally GraphOps.ccEagerCheckpoint = prior
  }

  test("versioned IVF delete probes every segment in one job train") {
    import graft.operators.VersionedIvf
    import spark.implicits._
    val emb = (0L until 64L)
      .map(i => (i, Array.tabulate(8)(j => ((i * 7 + j * 3) % 13 + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val root = graft.RunDirs.freshDir("jobs-ivf-del").toString
    VersionedIvf.build(emb.filter(col("vec_id") % 4 =!= 3), root, nlist = 4)
    VersionedIvf.append(spark, emb.filter(col("vec_id") % 8 === 3), root, "d2a")
    VersionedIvf.append(spark, emb.filter(col("vec_id") % 8 === 7), root, "d2b")
    // 3 segments live (build + 2 appends). The affected-leaf probe must
    // be ONE unioned semi-join job train, not one per segment: measured 7
    // jobs total for the whole delete (probe + survivor rewrite) after
    // the r16 fusion; the pre-fusion per-segment loop cost ~2 probe jobs
    // per segment on top (s16's full chain measured 43 → 35 jobs). The
    // pin leaves one job of headroom and discriminates cleanly: a
    // re-split probe costs at least 2 more per extra segment.
    val (_, jobs) = jobsDuring(
      VersionedIvf.delete(spark, root,
        emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))))
    assert(jobs <= 8, s"versioned delete submitted $jobs jobs for 3 segments " +
      "— the affected-leaf probe has re-split into per-segment jobs")
  }
}
