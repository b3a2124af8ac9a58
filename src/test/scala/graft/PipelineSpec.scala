package graft

import graft.operators.Pipeline
import org.scalatest.funsuite.AnyFunSuite

/** e03 admission-diff semantics on a planted corpus: every flip class
  * that CAN happen under a quality-threshold change is planted and
  * asserted, and the class that CANNOT (admitted ↔ duplicate — see the
  * [[Pipeline.admissionDiff]] scaladoc's invariance argument) is held
  * impossible over the whole output. */
class PipelineSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  // quality anatomy (TextFns.qualityScore): 0.4 for >= 10 tokens,
  // 0.3 for punct ratio <= 0.1, 0.3 for stopword ratio >= 0.05
  private val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val docs = Seq(
    // eval set (doc_id < 20)
    (0L, evalText, "en"),
    // 30: q = 0.4 (10 tokens, punct-heavy, no stopwords) — admitted only at 0.4
    (30L, "cat! dog! bird! fish! lion! tiger! bear! wolf! fox! deer!", "en"),
    // 40: q = 0.6 AND shares an eval 5-gram — quality @0.7 -> contaminated @0.4
    (40L, "the alpha beta gamma delta epsilon", "en"),
    // 50/51: identical mid-quality twins — quality @0.7 -> admitted/duplicate @0.4
    (50L, "the cat and dog runs", "en"),
    (51L, "the cat and dog runs", "en"),
    // 60/61: identical high-quality twins — admitted/duplicate under BOTH
    (60L, "the cat and the dog walk to the park every day", "en"),
    (61L, "the cat and the dog walk to the park every day", "en"),
    // 70: q = 0.3 (short, no stopwords) — rejected under both
    (70L, "cat dog", "en")
  ).toDF("doc_id", "text", "lang")

  private lazy val out = Pipeline.admissionDiff(docs)
    .collect()
    .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getInt(3))))
    .toMap

  test("every planted flip class lands where the gate order says") {
    assert(out(30L) === (("quality", "admitted", 1)))
    assert(out(40L) === (("quality", "contaminated", 1)))
    assert(out(50L) === (("quality", "admitted", 1)))
    assert(out(51L) === (("quality", "duplicate", 1)))
    assert(out(60L) === (("admitted", "admitted", 0)))
    assert(out(61L) === (("duplicate", "duplicate", 0)))
    assert(out(70L) === (("quality", "quality", 0)))
  }

  test("coverage and the admitted<->duplicate impossibility invariant") {
    // one row per corpus doc, none for eval docs
    assert(out.keySet === Set(30L, 40L, 50L, 51L, 60L, 61L, 70L))
    // fp-groups are status-homogeneous up to the keeper role, so a config
    // change can never swap who the keeper is
    out.values.foreach { case (a, b, _) =>
      assert(!(a == "admitted" && b == "duplicate"), s"keeper shift: $a -> $b")
      assert(!(a == "duplicate" && b == "admitted"), s"keeper shift: $a -> $b")
    }
  }

  // ---- e04: deterministic global shuffle → balanced shards -------------

  private def corpus(n: Int) = (0 until n)
    .map(i => (i.toLong, s"word$i text number $i of the corpus"))
    .toDF("doc_id", "text")

  test("shuffleShards: layout is a permutation with exactly balanced shards") {
    val n = 101; val s = 8
    val rows = Pipeline.shuffleShards(corpus(n), shards = s).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length === n)
    // (shard, pos) pairs are distinct and positions are contiguous per shard
    assert(rows.map(r => (r._2, r._3)).toSet.size === n)
    val perShard = rows.groupBy(_._2).view.mapValues(_.map(_._3).sorted).toMap
    assert(perShard.keySet === (0 until s).toSet)
    perShard.values.foreach(ps => assert(ps.toSeq === (0L until ps.length).toSeq))
    // round-robin balance: shard sizes differ by at most one
    val sizes = perShard.values.map(_.length)
    assert(sizes.max - sizes.min <= 1, s"unbalanced shards: $perShard")
  }

  test("shuffleShards: two-pass ranks equal the naive global window spec") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = corpus(257)
    val got = Pipeline.shuffleShards(docs, shards = 8)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val h = graft.functions.PortableHash.baseHash(
      concat(lit("r0|"), col("doc_id").cast("string")))
    val naive = docs.select(col("doc_id"), h.as("h"))
      .withColumn("rk",
        (row_number().over(Window.orderBy(col("h"), col("doc_id"))) - 1).cast("long"))
      .collect()
      .map(r => r.getLong(0) -> (((r.getLong(2) % 8).toInt, r.getLong(2) / 8)))
      .toMap
    assert(got === naive)
  }

  test("shuffleShards: deterministic per salt, re-keyed by a new salt") {
    val docs = corpus(64)
    def layout(salt: String) = Pipeline.shuffleShards(docs, 4, salt)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(layout("r0") === layout("r0"))
    assert(layout("r0") !== layout("r1"), "epoch re-salt must move documents")
  }

  test("corpusDiff: all four statuses, keyed by content not layout") {
    import spark.implicits._
    val oldV = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    // doc 2 edited, doc 3 removed, doc 4 added; doc 1's text is byte-
    // different but normalizes identically -> unchanged (content diff,
    // not bytes diff)
    val newV = Seq((1L, "  ALPHA "), (2L, "beta edited"), (4L, "delta"))
      .toDF("doc_id", "text")
    val statuses = Pipeline.corpusDiff(oldV, newV).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(statuses === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }
}
