package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys.
  *
  * AQE's skew-join splitting handles joins; for aggregations over
  * power-law keys (the reference's deg² hub problem, SURVEY.md §7.6) the
  * classic fix is two-phase salted aggregation: shard each hot key across
  * `salts` reducers, partially aggregate, then merge. Spark's hash
  * aggregate already does map-side partial aggregation, which covers most
  * cases — salting matters when a single key's *merged partials* still
  * overwhelm one reducer (e.g. collect_list/distinct-heavy aggs).
  *
  * Salt derivation is deterministic (hash of a uniqueness column, not
  * rand()) so retried tasks produce identical results — rand() in a
  * shuffle input is a correctness bug under task retry at scale.
  */
object Skew {

  /** Add a deterministic salt column in [0, salts) derived from `unique`. */
  def withSalt(df: DataFrame, unique: Column, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(unique), lit(salts)))

  /** Salted equi-join for a hot-keyed big side against a NON-broadcastable
    * smaller side: the big side is sharded across `salts` sub-keys by a
    * deterministic salt, the small side is replicated once per salt value
    * (an in-row explode — no extra scan), and the join runs on
    * (key, salt), spreading each hot key over `salts` reducers.
    *
    * Result-identical to `big.join(small, bigKey === smallKey)`; the salt
    * never escapes. Cost model: the small side's shuffle volume is
    * multiplied by `salts` — worth it exactly when the small side is too
    * big to broadcast but far smaller than the big side's hot partitions
    * (otherwise use `broadcast()` and no salt at all, or let AQE split
    * skewed partitions when ITS thresholds catch them; this operator is
    * the deterministic fallback for when they don't — e.g. one key above
    * every threshold). The small side carries a SHUFFLE_HASH hint: a
    * caller reaching for saltedJoin has already decided against
    * broadcast, and a sort for merge-join would be wasted on salt-sharded
    * partitions. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: Column,
      smallKey: Column, unique: Column, salts: Int): DataFrame = {
    val b = big.withColumn("_salt_b", pmod(hash(unique), lit(salts)))
    val s = small
      .withColumn("_salt_s", explode(array((0 until salts).map(lit): _*)))
      .hint("shuffle_hash")
    b.join(s, bigKey === smallKey && col("_salt_b") === col("_salt_s"))
      .drop("_salt_b", "_salt_s")
  }

  /** Two-phase salted count/sum per key. `sums` maps output name →
    * column to sum; counts land in `n`. */
  def saltedAggregate(df: DataFrame, key: Column, unique: Column, salts: Int,
      sums: Map[String, Column] = Map.empty): DataFrame = {
    val salted = withSalt(df, unique, salts)
    val partialAggs = count(lit(1)).as("_n") +:
      sums.map { case (name, c) => sum(c).as(s"_s_$name") }.toSeq
    val partial = salted.groupBy(key.as("key"), col("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sum(col("_n")).as("n") +:
      sums.keys.map(name => sum(col(s"_s_$name")).as(name)).toSeq
    partial.groupBy(col("key"))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
