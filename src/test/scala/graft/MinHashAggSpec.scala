package graft

import graft.functions.{MinHashAggregator, PortableHash, TextFns}
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinHashAggSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs away"),
    (1L, "a completely different set of words about spark engines here"),
    (2L, "the quick brown fox jumps over the lazy dog and walks home"))
    .map { case (id, t) => (id, t, "en") }.toDF("doc_id", "text", "lang")

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    Dedup.shingles(df)
      .withColumn("h", PortableHash.baseHash(col("s")))
      .groupBy(col("doc_id"))
      .agg(MinHashAggregator.minhashSketch(col("h")).as("sig"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap

  test("aggregator sketch equals the column-wise signature") {
    val viaAgg = sketchOf(docs)
    val viaCols = Dedup.minhashSignature(docs).collect()
      .map(r => (r.getLong(0), (1 to PortableHash.K).map(i => r.getLong(i)))).toMap
    assert(viaAgg === viaCols)
  }

  test("sketches are mergeable: sketch(A ∪ B) == merge(sketch A, sketch B)") {
    val partA = docs.filter($"doc_id" < 1)
    val partB = docs.filter($"doc_id" >= 1)
    // simulate incremental pipeline: independent sketches of each part's
    // full shingle set, merged later
    def corpusSketch(df: org.apache.spark.sql.DataFrame): Array[Long] =
      Dedup.shingles(df)
        .withColumn("h", PortableHash.baseHash(col("s")))
        .agg(MinHashAggregator.minhashSketch(col("h")).as("sig"))
        .collect().head.getSeq[Long](0).toArray
    val merged = MinHashAggregator.agg.merge(corpusSketch(partA), corpusSketch(partB))
    assert(merged.toSeq === corpusSketch(docs).toSeq)
  }

  test("estJaccard: near-dups high, unrelated low") {
    val s = sketchOf(docs).map { case (k, v) => (k, v.toArray) }
    assert(MinHashAggregator.estJaccard(s(0L), s(2L)) > 0.4)  // one-word diff
    assert(MinHashAggregator.estJaccard(s(0L), s(1L)) < 0.3)  // unrelated
  }
}
