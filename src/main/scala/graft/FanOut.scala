package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive scan fan-out for CPU-bound first stages.
  *
  * The problem (guide §2.5 "input skew — one huge unsplittable file"): a
  * scan's parallelism is bytes/`maxPartitionBytes`, so a small input —
  * one file, one parquet row group, as the local test tiers are — plans
  * as ONE task, and every per-row-expensive first stage (tokenize +
  * md5-per-shingle × K MinHash transforms, PNG/GIF/WAV codec round
  * trips, 600 k-row partial aggregations) runs on one core of 32. AQE
  * cannot help: it only re-partitions where an exchange already exists,
  * and the first stage is BEFORE the first exchange.
  *
  * The fix is the guide's "repartition immediately after the read",
  * gated so it is a structural no-op at scale: the fan-out fires only
  * when the plan's own size estimate says the scan cannot reach
  * `defaultParallelism` tasks (estimate < maxPartitionBytes × cores).
  * At 100 TB the inputs carry thousands of partitions and the guard
  * never fires — no added exchange, no local-only tuning; on the small
  * tier it converts the single-task first stage into a cores-wide one
  * for one tiny shuffle of the scan output.
  *
  * When the caller supplies `keys`, the fan-out hash-partitions on them
  * (deterministic placement, no sort-before-repartition pass) — and if a
  * downstream aggregation/join is keyed compatibly (e.g. the MinHash
  * `groupBy(doc_id)` above a fan-out on `doc_id` with the same partition
  * count), EnsureRequirements recognizes the distribution as satisfied
  * and the fan-out REPLACES that exchange instead of adding one: the
  * heavy stage parallelizes and the exchange count stays flat. Keyless
  * fan-out falls back to round-robin.
  *
  * Never applied to streaming frames (repartition semantics differ and
  * the micro-batch planner owns partitioning there).
  */
object FanOut {

  /** Fan `df` out to `defaultParallelism` partitions when (a) it is a
    * narrow chain rooted at file scans — anything already downstream of
    * a shuffle/materialization (join, aggregate, window, sort, explicit
    * repartition, localCheckpoint) is left alone, its parallelism was
    * already decided — and (b) its size estimate says the scan cannot
    * reach that parallelism by splitting. Call ahead of CPU-dominant
    * per-row work. */
  def cpuBound(df: DataFrame, keys: Column*): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    // The ANALYZED plan, not the optimized one (r15 verdict #8 / ADVICE):
    // forcing `optimizedPlan` here ran a full optimization pass whose
    // result was thrown away — the returned repartitioned frame re-plans
    // from scratch — and that fixed cost was paid by every fan-out call
    // site even at scale, where the guard then does nothing. Analysis has
    // already run (the DataFrame's schema forced it), and both guards
    // only need what the analyzed tree shows: wide nodes are wide before
    // optimization too (Distinct/Deduplicate are matched explicitly —
    // the optimizer would have rewritten them to Aggregate), and the
    // size estimate for a narrow scan-rooted chain is the same
    // file-size-derived figure on either tree.
    val plan = df.queryExecution.analyzed
    import org.apache.spark.sql.catalyst.plans.logical._
    val wide = plan.exists {
      case _: Join | _: Aggregate | _: Window | _: Sort => true
      case _: Distinct | _: Deduplicate => true
      case _: RepartitionOperation => true
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case _ => false
    }
    if (wide) return df
    val est = plan.stats.sizeInBytes
    if (est < BigInt(maxSplit) * target) {
      if (keys.nonEmpty) df.repartition(target, keys: _*)
      else df.repartition(target)
    } else df
  }
}
