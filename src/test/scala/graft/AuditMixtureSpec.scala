package graft

import graft.operators.{Dedup, Profile}
import graft.operators.Profile.Constraint
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit certification for the round-7 pipeline additions:
  * p15's single-pass constraint audit and d21's temperature-scaled
  * mixture weights (both also DuckDB-oracle-gated end-to-end).
  */
class AuditMixtureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def auditMap(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => r.getString(0) -> ((r.getLong(1), r.getInt(3)))).toMap

  test("constraintAudit: exact basis points, pass and fail verdicts") {
    // 4 rows: one null v, one duplicate id, one out-of-domain status —
    // every fraction is exactly 3/4 = 7500 bp
    val df = Seq[(Int, Option[Double], String)](
      (1, Some(10.0), "O"), (2, None, "F"), (3, Some(5.0), "X"),
      (1, Some(1.0), "O")).toDF("id", "v", "status")
    val out = auditMap(Profile.constraintAudit(df, Seq(
      Constraint.complete("complete_v", col("v")),
      Constraint.unique("unique_id", col("id")),
      Constraint.satisfies("positive_v", col("v") > 0),
      Constraint.satisfies("status_of", col("status").isin("O", "F"), 7500)))
      .collect())
    assert(out("complete_v") === ((7500L, 0)))
    assert(out("unique_id") === ((7500L, 0)))
    assert(out("positive_v") === ((7500L, 0)))
    // >= threshold is a PASS: 7500 bp against a 7500 bp demand
    assert(out("status_of") === ((7500L, 1)))
  }

  test("constraintAudit: null predicate rows count as violations") {
    val df = Seq[(Int, Option[Double])]((1, Some(1.0)), (2, None))
      .toDF("id", "v")
    val out = auditMap(Profile.constraintAudit(df,
      Seq(Constraint.satisfies("positive_v", col("v") > 0))).collect())
    assert(out("positive_v") === ((5000L, 0)))
  }

  test("constraintAudit: empty table passes vacuously") {
    val df = Seq((1, 1.0)).toDF("id", "v").filter(col("id") < 0)
    val out = auditMap(Profile.constraintAudit(df, Seq(
      Constraint.complete("complete_v", col("v")),
      Constraint.unique("unique_id", col("id")))).collect())
    assert(out("complete_v") === ((10000L, 1)))
    assert(out("unique_id") === ((10000L, 1)))
  }

  test("mixtureWeights: hand-computed sqrt-temperature shares and epochs") {
    // domains with 9 / 16 / 25 tokens: sqrt weights 3:4:5 (sum 12)
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      ("a", words(9)), ("b", words(8)), ("b", words(8)), ("c", words(25)))
      .toDF("source", "text")
    val out = Dedup.mixtureWeights(docs, budgetTokens = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out("a") === ((1L, 9L, 0.18, 0.25, 2.7778)))
    assert(out("b") === ((2L, 16L, 0.32, 0.3333, 2.0833)))
    assert(out("c") === ((1L, 25L, 0.5, 0.4167, 1.6667)))
  }

  test("budgetSelect: prefix rule, exact boundary, and doc_id tie-break") {
    // score 9: docs 1 (5 tok) and 2 (5 tok); score 5: doc 3 (4 tok);
    // budget 14 ⇒ 1, 2 kept, 3 lands exactly ON the boundary (kept),
    // then nothing else fits
    val docs = Seq((1L, 9L, 5L), (2L, 9L, 5L), (3L, 5L, 4L), (4L, 5L, 9L),
      (5L, 1L, 1L)).toDF("doc_id", "s", "w")
    val out = Dedup.budgetSelect(docs, col("s"), col("w"), budget = 14L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out === Map(1L -> 5L, 2L -> 10L, 3L -> 14L))
  }

  test("budgetSelect: two-pass cumsum equals the naive reference at any partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 200L).map(i => (i, rnd.nextInt(20).toLong,
      (1 + rnd.nextInt(50)).toLong))
    val docs = rows.toDF("doc_id", "s", "w")
    // naive reference: sort by (score desc, doc_id), running-sum prefix
    val expected = rows.sortBy { case (id, s, _) => (-s, id) }
      .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, cum), (id, s, w)) =>
        (id, s, w, cum + w) }
      .drop(1).takeWhile(_._4 <= 1000L)
      .map { case (id, _, _, cum) => id -> cum }.toMap
    for (parts <- Seq(1, 3, 8)) {
      val got = Dedup.budgetSelect(docs, col("s"), col("w"), 1000L, parts)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got === expected, s"mismatch at numParts=$parts")
    }
  }

  test("mixtureWeights: alpha = 1 reproduces raw shares") {
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(("a", words(10)), ("b", words(30))).toDF("source", "text")
    val out = Dedup.mixtureWeights(docs, alpha = 1.0, budgetTokens = 40L)
      .collect().map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))).toMap
    // α = 1 ⇒ temp share == raw share ⇒ every domain sees exactly one epoch
    assert(out("a") === ((0.25, 0.25, 1.0)))
    assert(out("b") === ((0.75, 0.75, 1.0)))
  }
}
