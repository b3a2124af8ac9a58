package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall characterization of the ANN operators against the exact top-k —
  * the recall/cost curve IS the operator's spec: single-table recall falls
  * as planes grow (AND-amplification), and the multi-table path buys it
  * back (OR-amplification) to the ≥0.8 target the registered s03 setting
  * ships with. */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val k = 10
  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val queries = emb.filter($"vec_id" < 50)

  private def topkSet(df: DataFrame): Set[(Long, Long)] =
    df.select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exact = topkSet(Similarity.bruteForceTopK(emb, queries, k))

  private def recall(approx: Set[(Long, Long)]): Double =
    (exact & approx).size.toDouble / exact.size

  test("single-table recall@10 falls with planes (AND-amplification)") {
    val curve = Seq(4, 8, 12).map { p =>
      p -> recall(topkSet(Similarity.lshTopK(emb, queries, k, planes = p)))
    }
    info(s"single-table recall@10 by planes: $curve")
    // more planes -> stricter buckets -> recall must not increase
    assert(curve.sliding(2).forall { case Seq((_, a), (_, b)) => b <= a + 1e-9 })
    // and every single-table setting is far below the 0.8 target on this
    // weakly-clustered corpus — which is why s03 is the registered ANN path
    assert(curve.forall(_._2 < 0.8))
  }

  test("int8 rerank recall@10 >= 0.95: stage-1 quantization barely perturbs the candidate cut") {
    // the re-rank stage scores candidates with EXACT cosine, so any miss
    // can only come from a true top-10 neighbor falling outside the
    // stage-1 top-40 int8 cut — with 7-bit quantization that should be
    // near-lossless, unlike the LSH paths whose recall is structural
    val r = recall(topkSet(Similarity.quantizedRerank(emb, queries, k)))
    info(s"int8-rerank recall@10 (candMult=4): $r")
    assert(r >= 0.95, s"recall $r below target")
  }

  test("PQ-ADC beats random ranking and reports its recall curve") {
    // PQ with a 16-entry untrained codebook per subspace is the COARSEST
    // of the ANN paths — the point of s07 is the memory layout (codes
    // replace floats at 64x compression), not peak recall, and a real
    // deployment trains the codebooks. The floor asserts the scores
    // carry real signal on a weakly-clustered corpus: random top-10
    // would recall 10/n ~ 0.02.
    val r = recall(topkSet(Similarity.pqTopK(emb, queries, k)))
    info(s"pq-adc recall@10 (m=8, ksub=16, untrained): $r")
    assert(r >= 0.2, s"recall $r indistinguishable from random")
  }

  test("multi-table recall@10 >= 0.8 at the registered s03 setting (4 planes x 16 tables)") {
    val r = recall(topkSet(Similarity.lshTopKMulti(emb, queries, k, planes = 4, tables = 16)))
    info(s"multi-table recall@10 (planes=4, tables=16): $r")
    assert(r >= 0.8, s"recall $r below target")
  }

  test("multi-table recall grows with table count (OR-amplification)") {
    val r4 = recall(topkSet(Similarity.lshTopKMulti(emb, queries, k, planes = 4, tables = 4)))
    val r16 = recall(topkSet(Similarity.lshTopKMulti(emb, queries, k, planes = 4, tables = 16)))
    info(s"recall@10: tables=4 -> $r4, tables=16 -> $r16")
    assert(r16 > r4)
  }

  test("multi-table with 1 table == single-table lshTopK") {
    val multi = topkSet(Similarity.lshTopKMulti(emb, queries, k, planes = 4, tables = 1))
    val single = topkSet(Similarity.lshTopK(emb, queries, k, planes = 4))
    assert(multi === single)
  }

  test("ivfTopK: probing ALL lists == exact brute-force top-k") {
    // with nprobe = nlist the probe set is the whole corpus, so IVF must
    // degrade to exactly the brute-force ranking — the exactness core the
    // nprobe < nlist approximation then restricts
    val all = topkSet(Similarity.ivfTopK(emb, queries, k, nlist = 8, nprobe = 8))
    assert(all === exact)
  }

  test("ivfTopK recall@10 at the registered s05 setting (nlist=8, nprobe=2)") {
    val r = recall(topkSet(Similarity.ivfTopK(emb, queries, k, nlist = 8, nprobe = 2)))
    info(s"ivf recall@10 (nlist=8, nprobe=2): $r")
    // data-blind lower bound: probing 2/8 lists must beat 1/8 of the
    // exact set on clustered embeddings; the measured value is the spec
    assert(r >= 0.125, s"recall $r below the single-list floor")
  }

  test("ivfPqTopK: probing ALL lists + wide re-rank == exact brute-force top-k") {
    // nprobe = nlist makes every cell a probed cell, and a candMult
    // covering the whole corpus makes the ADC cut a no-op — the exact
    // float re-rank must then reproduce the brute-force ranking
    // bit-for-bit, certifying that neither the cell restriction nor the
    // stage-1 cut drops anything when disabled, and that (q, x) pairs
    // form at most once through the cell join (else ranks would shift).
    val n = emb.count().toInt
    val all = topkSet(Similarity.ivfPqTopK(emb, queries, k,
      nlist = 8, nprobe = 8, candMult = n))
    assert(all === exact)
  }

  test("ivfPqTopK structural contract + recall at the registered s09 setting") {
    val got = Similarity.ivfPqTopK(emb, queries, k).collect()
    // no self pairs, ranks are 1..<=k and contiguous per query
    assert(got.forall(r => r.getLong(0) != r.getLong(1)))
    val byQ = got.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val ranks = rs.map(_.getInt(3)).sorted
      assert(ranks === (1 to ranks.length).toArray, "ranks must be 1..n contiguous")
      assert(ranks.length <= k)
    }
    val r = recall(topkSet(Similarity.ivfPqTopK(emb, queries, k)))
    info(s"ivf-pq recall@10 (nlist=8, nprobe=2, candMult=4): $r")
    // the PQ stage can only restrict the IVF candidate set, so the floor
    // argument is the s05 one: 2/8 lists probed must beat a 1/8 share
    assert(r >= 0.125, s"recall $r below the single-list floor")
  }

  test("knnJoin: probing ALL lists == exact per-vector top-k") {
    // nprobe = nlist makes every cell a probed cell, so the self-join
    // must reproduce the exact whole-corpus top-k ranking bit-for-bit —
    // which also certifies the no-distinct argument (each neighbor joins
    // exactly once via its single home cell, or ranks would shift)
    val viaJoin = topkSet(Similarity.knnJoin(emb, k = 3, nlist = 8, nprobe = 8))
    val exact3 = topkSet(Similarity.bruteForceTopK(emb, emb, k = 3))
    assert(viaJoin === exact3)
  }

  test("knnJoin structural contract: no self pairs, ranks 1..k, k bound") {
    val out = Similarity.knnJoin(emb, k = 3).collect()
    assert(out.forall(r => r.getLong(0) != r.getLong(1)), "self pair leaked")
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      val ranks = rows.map(_.getInt(3)).sorted.toSeq
      assert(ranks === (1 to ranks.size), s"ranks not contiguous for qid=$q")
      assert(ranks.size <= 3, s"more than k neighbors for qid=$q")
    }
  }

  test("knnJoin recall: every planted high-cosine twin finds its base at rank 1") {
    // the SemDeDup use case: a near-duplicate's nearest neighbor must
    // surface through the cell join even at nprobe=2 — a twin at
    // cos ≈ 0.997 shares its base's home cell (or probes it second)
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val bases = (0 until 10).map(i => (i.toLong, vec()))
    val twins = bases.map { case (i, v) =>
      (100L + i, v.map(x => x + rnd.nextGaussian().toFloat * 0.02f))
    }
    val loners = (0 until 40).map(i => (1000L + i, vec()))
    val planted = spark.createDataFrame(bases ++ twins ++ loners)
      .toDF("vec_id", "embedding")
    val top1 = Similarity.knnJoin(planted, k = 1, nlist = 8, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    bases.foreach { case (i, _) =>
      assert(top1(100L + i) === i, s"twin of $i missed its base: ${top1.get(100L + i)}")
      assert(top1(i) === 100L + i, s"base $i missed its twin: ${top1.get(i)}")
    }
  }

  // ---- s11: incremental IVF index maintenance ---------------------------

  private def postingsRows(dir: String): Set[(Long, Long, String)] =
    spark.read.parquet(s"$dir/postings")
      .select($"vec_id", $"cid".cast("long"), $"batch_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("s11: append(day2) == rebuild(union, frozen day-1 centroids), and a retried append is a no-op") {
    val day1 = emb.filter($"vec_id" % 4 =!= 3)
    val day2 = emb.filter($"vec_id" % 4 === 3)
    val grown = java.nio.file.Files.createTempDirectory("s11-grown").toString
    val rebuilt = java.nio.file.Files.createTempDirectory("s11-rebuilt").toString
    Similarity.buildIvfIndex(day1, grown, nlist = 8)
    Similarity.appendIvfIndex(spark, day2, grown, batchId = "day2")
    val afterFirst = postingsRows(grown)
    Similarity.appendIvfIndex(spark, day2, grown, batchId = "day2")
    assert(postingsRows(grown) === afterFirst,
      "retried append changed the artifact — dynamic overwrite not idempotent")
    // rebuild the union against the SAME frozen day-1 centroids: cell
    // assignment is a pure per-vector function of the centroid table, so
    // postings must agree on every (vec_id, cid) — batch_id is lineage
    Similarity.buildIvfIndex(emb, rebuilt, nlist = 8,
      centroidSource = Some(day1))
    assert(afterFirst.map(r => (r._1, r._2)) ===
      postingsRows(rebuilt).map(r => (r._1, r._2)))
    // and the probe over the grown artifact == the probe over the rebuild
    def probe(dir: String) = Similarity
      .probeIvfIndex(spark, dir, queries, k, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    assert(probe(grown) === probe(rebuilt))
  }

  test("s11: probing ALL cells of the grown index == exact top-k on the grown corpus") {
    // the recall gate on the union: with nprobe >= the frozen centroid
    // count every posting list is probed, so the incremental index must
    // reproduce the exact brute-force ranking over day1 UNION day2 —
    // nothing was lost or double-indexed on the way in
    val day1 = emb.filter($"vec_id" % 4 =!= 3)
    val day2 = emb.filter($"vec_id" % 4 === 3)
    val idx = java.nio.file.Files.createTempDirectory("s11-all").toString
    Similarity.buildIvfIndex(day1, idx, nlist = 8)
    Similarity.appendIvfIndex(spark, day2, idx, batchId = "day2")
    val got = topkSet(Similarity.probeIvfIndex(spark, idx, queries, k, nprobe = 8))
    assert(got === exact)
    // and at the registered nprobe=2 the approximation keeps real signal
    val r2 = recall(topkSet(
      Similarity.probeIvfIndex(spark, idx, queries, k, nprobe = 2)))
    info(s"s11 grown-index recall@10 (nprobe=2, 6 frozen day-1 cells): $r2")
    assert(r2 >= 0.25, s"recall $r2 below the 2-of-6-cells floor")
  }

  test("s13: filtered probe over ALL cells == exact top-k over the eligible subset") {
    // with every cell probed the only restriction left is the filter, so
    // pre-filtering must reproduce brute force over the filtered corpus —
    // the property post-filtering (rank first, filter after) fails
    val idx = java.nio.file.Files.createTempDirectory("s13-idx").toString
    Similarity.buildIvfIndex(emb, idx, nlist = 8)
    val got = topkSet(Similarity.probeIvfIndexFiltered(
      spark, idx, queries, k, nprobe = 8, col("vec_id") % 2 === 0))
    val exactEven = topkSet(Similarity.bruteForceTopK(
      emb.filter($"vec_id" % 2 === 0), queries, k))
    assert(got === exactEven)
    // and every returned neighbor satisfies the predicate
    assert(got.forall(_._2 % 2 == 0))
  }

  test("s14: index stats account for every vector and survive compaction") {
    val day1 = emb.filter($"vec_id" % 4 =!= 3)
    val day2 = emb.filter($"vec_id" % 4 === 3)
    val idx = java.nio.file.Files.createTempDirectory("s14-idx").toString
    Similarity.buildIvfIndex(day1, idx, nlist = 8)
    Similarity.appendIvfIndex(spark, day2, idx, batchId = "day2")
    val stats = Similarity.ivfIndexStats(spark, idx).collect()
    val totalBase = stats.map(_.getLong(1)).sum
    val totalNew = stats.map(_.getLong(2)).sum
    // every non-zero vector of each split lands in exactly one cell
    val d1n = day1.filter(graft.functions.VectorFns.nonZero(
      graft.functions.VectorFns.toDouble($"embedding"))).count()
    val d2n = day2.filter(graft.functions.VectorFns.nonZero(
      graft.functions.VectorFns.toDouble($"embedding"))).count()
    assert(totalBase === d1n)
    assert(totalNew === d2n)
    // the monitor reads the same truth off a compacted copy (lineage
    // survives as a data column)
    val out = java.nio.file.Files.createTempDirectory("s14-out").toString
    Similarity.compactIvfIndex(spark, idx, out)
    assert(Similarity.ivfIndexStats(spark, out).collect().map(_.toSeq).toSet ===
      stats.map(_.toSeq).toSet)
  }

  test("s12: compaction collapses every cell to ONE file and keeps the cid layout") {
    val day1 = emb.filter($"vec_id" % 4 =!= 3)
    val day2 = emb.filter($"vec_id" % 4 === 3)
    val idx = java.nio.file.Files.createTempDirectory("s12-idx").toString
    val out = java.nio.file.Files.createTempDirectory("s12-out").toString
    Similarity.buildIvfIndex(day1, idx, nlist = 8)
    Similarity.appendIvfIndex(spark, day2, idx, batchId = "day2")
    Similarity.compactIvfIndex(spark, idx, out)
    val cidDirs = new java.io.File(s"$out/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid="))
    assert(cidDirs.nonEmpty, "compacted postings lost the cid directory layout")
    cidDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1,
        s"${d.getName}: ${parts.length} files after compaction, expected 1")
    }
    // row-identical through the rewrite (batch lineage kept as a column)
    val before = spark.read.parquet(s"$idx/postings")
      .select($"vec_id", $"cid".cast("long"), $"batch_id")
      .collect().map(_.toSeq).toSet
    val after = spark.read.parquet(s"$out/postings")
      .select($"vec_id", $"cid".cast("long"), $"batch_id")
      .collect().map(_.toSeq).toSet
    assert(after === before)
  }
}
