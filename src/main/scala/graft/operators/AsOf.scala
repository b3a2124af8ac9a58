package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-travel) join: for each left row, the most recent right row
  * with the same key and `rightTs <= leftTs`.
  *
  * Spark has no ASOF JOIN operator; the classic scalable formulation is a
  * tagged UNION + per-key ordered window with `last(..., ignoreNulls)` —
  * one shuffle on the key, no range-join explosion, and the window frame
  * is running (no full-partition buffering). This beats a theta-join
  * (`l.key = r.key AND r.ts <= l.ts` + argmax) which explodes to
  * |matches| rows before reducing; at 100 TB the union-window form moves
  * each row exactly once.
  */
object AsOf {

  /** Join `left` to the latest `right` row per key at-or-before the left
    * timestamp (`direction = "backward"`, the default), or the earliest
    * at-or-after (`"forward"` — the traversal runs in reverse timestamp
    * order, same single shuffle). With `toleranceMs` set, a match farther
    * than the tolerance is nulled out — the pandas `merge_asof`
    * direction/tolerance surface. Right columns other than key/ts arrive
    * nested in a `matched` struct (null when nothing qualifies).
    * `toleranceMs` requires a TIMESTAMP-typed `ts` column (the gap is
    * measured with `unix_millis`); directionless numeric timelines work
    * only without tolerance.
    *
    * Determinism note: if multiple right rows share (key, ts), which one
    * matches is tie-dependent — pre-collapse the right side to one row
    * per (key, ts) when that matters (as st12 does). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      direction: String = "backward",
      toleranceMs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val rightPayload = struct(
      right.columns.filter(_ != key).map(c => col(c)).toSeq: _*)
    val l = left.withColumn("_is_left", lit(1))
      .withColumn("_r", lit(null).cast(
        right.withColumn("_p", rightPayload).schema("_p").dataType))
    val r = right
      .withColumn("_is_left", lit(0))
      .withColumn("_r", rightPayload)
      .select(col(key), col(ts), col("_is_left"), col("_r"))
    val unioned = l.select(
        (Seq(col(key), col(ts), col("_is_left"), col("_r")) ++
          left.columns.filterNot(c => c == key || c == ts).map(c => col(c))): _*)
      .unionByName(r, allowMissingColumns = true)
    // rights sort before lefts at equal ts so "at-or-before" (backward) /
    // "at-or-after" (forward) includes ties; forward just traverses in
    // reverse timestamp order
    val order =
      if (direction == "backward") Seq(col(ts).asc, col("_is_left").asc)
      else Seq(col(ts).desc, col("_is_left").asc)
    val w = Window.partitionBy(col(key))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("_r"), ignoreNulls = true).over(w)
    val matched = toleranceMs match {
      case None => matchedRaw
      case Some(tol) =>
        when(abs(unix_millis(matchedRaw.getField(ts)) - unix_millis(col(ts))) <= tol,
          matchedRaw)
    }
    unioned
      .withColumn("matched", matched)
      .filter(col("_is_left") === 1)
      .drop("_is_left", "_r")
  }
}
