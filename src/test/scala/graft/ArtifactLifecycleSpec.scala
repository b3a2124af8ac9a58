package graft

import graft.operators.{Dedup, Similarity, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle operators (build / append / probe over a FILESYSTEM
  * artifact) meeting degenerate inputs — the class of bug s10 shipped in
  * round 11 (`UNABLE_TO_INFER_SCHEMA` probing the fileless postings dir
  * an empty partitioned build leaves behind). EmptyInputSpec gates every
  * registered query's DEFAULT path on an empty corpus; this spec walks
  * the lifecycle edges the registered arms don't reach: build-on-empty
  * then probe, append-an-empty-batch, probe-with-zero-queries, and
  * append-into-an-empty-build — for the IVF index (s10/s11), the LSH
  * band index (d28), and the trained-tokenizer artifact (t18/t19/e07).
  * Every arm asserts the operation is a structured no-op (empty result,
  * schema intact, existing artifact untouched), never a throw.
  */
class ArtifactLifecycleSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private lazy val emb =
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val docs =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def probeRows(dir: String, queries: DataFrame): Array[_] =
    Similarity.probeIvfIndex(spark, dir, queries, k = 5, nprobe = 2).collect()

  // ---- IVF index (s10 / s11) -------------------------------------------

  test("IVF: build on an empty corpus, probe with real queries — empty result, no throw") {
    val idx = tmp("alc-ivf-empty")
    Similarity.buildIvfIndex(emb.limit(0), idx, nlist = 8)
    assert(probeRows(idx, emb.filter($"vec_id" < 3)).isEmpty)
  }

  test("IVF: append an EMPTY batch — artifact byte-identical, probe unchanged") {
    val idx = tmp("alc-ivf-appendempty")
    Similarity.buildIvfIndex(emb, idx, nlist = 8)
    val before = probeRows(idx, emb.filter($"vec_id" < 3)).toSeq
    Similarity.appendIvfIndex(spark, emb.limit(0), idx, batchId = "day2")
    assert(probeRows(idx, emb.filter($"vec_id" < 3)).toSeq === before)
  }

  test("IVF: probe with ZERO queries — empty result, no throw") {
    val idx = tmp("alc-ivf-zeroq")
    Similarity.buildIvfIndex(emb, idx, nlist = 8)
    assert(probeRows(idx, emb.limit(0)).isEmpty)
  }

  test("IVF: append into an EMPTY build — no centroids means no postings, probe empty") {
    // a build that saw zero rows trained zero centroids; a later batch
    // has nothing to be assigned against, so the append is a structured
    // no-op (the pipeline's real fix is re-training — which is buildIvfIndex
    // itself) rather than a crash or a silently self-centroided index
    val idx = tmp("alc-ivf-appendinto")
    Similarity.buildIvfIndex(emb.limit(0), idx, nlist = 8)
    Similarity.appendIvfIndex(spark, emb, idx, batchId = "day2")
    assert(probeRows(idx, emb.filter($"vec_id" < 3)).isEmpty)
  }

  test("IVF: stats over an EMPTY index — empty result, no throw") {
    val idx = tmp("alc-ivf-stats-empty")
    Similarity.buildIvfIndex(emb.limit(0), idx, nlist = 8)
    assert(Similarity.ivfIndexStats(spark, idx).collect().isEmpty)
  }

  test("IVF: compact an EMPTY index — probe survives, empty result") {
    val idx = tmp("alc-ivf-compact-src")
    val out = tmp("alc-ivf-compact-dst")
    Similarity.buildIvfIndex(emb.limit(0), idx, nlist = 8)
    Similarity.compactIvfIndex(spark, idx, out)
    assert(probeRows(out, emb.filter($"vec_id" < 3)).isEmpty)
  }

  test("IVF delete: EVERYTHING — probe empty, no leaked leaves, no throw") {
    val idx = tmp("alc-ivf-del-all")
    Similarity.buildIvfIndex(emb.filter($"vec_id" < 40), idx, nlist = 4)
    Similarity.deleteFromIvfIndex(spark, idx,
      emb.filter($"vec_id" < 40).select($"vec_id"))
    assert(probeRows(idx, emb.filter($"vec_id" < 3)).isEmpty)
    // the delete-everything leak: dynamic overwrite can't empty a leaf,
    // so emptied leaves must be physically gone
    val leaves = java.nio.file.Files.walk(
        java.nio.file.Paths.get(idx, "postings"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    assert(leaves === 0L, "fully-deleted leaves left parquet files behind")
  }

  test("IVF delete: NOTHING (empty id set) — artifact untouched") {
    val idx = tmp("alc-ivf-del-none")
    Similarity.buildIvfIndex(emb.filter($"vec_id" < 40), idx, nlist = 4)
    val before = probeRows(idx, emb.filter($"vec_id" < 3)).toSeq
    Similarity.deleteFromIvfIndex(spark, idx, emb.limit(0).select($"vec_id"))
    // ids absent from the index are a no-op too
    Similarity.deleteFromIvfIndex(spark, idx,
      emb.filter($"vec_id" > 100000).select($"vec_id"))
    assert(probeRows(idx, emb.filter($"vec_id" < 3)).toSeq === before)
  }

  test("IVF delete: TWICE == once, and equals rebuild-without") {
    val idxDel = tmp("alc-ivf-del-twice")
    val idxRef = tmp("alc-ivf-del-ref")
    val corpus = emb.filter($"vec_id" < 60)
    Similarity.buildIvfIndex(corpus, idxDel, nlist = 4)
    val dels = corpus.filter($"vec_id" % 3 === 0).select($"vec_id")
    Similarity.deleteFromIvfIndex(spark, idxDel, dels)
    Similarity.deleteFromIvfIndex(spark, idxDel, dels)
    // rebuild WITHOUT the deleted ids against the SAME frozen centroids
    Similarity.buildIvfIndex(corpus.filter($"vec_id" % 3 =!= 0), idxRef,
      nlist = 4, centroidSource = Some(corpus))
    val qs = emb.filter($"vec_id" < 3)
    assert(probeRows(idxDel, qs).toSeq === probeRows(idxRef, qs).toSeq)
  }

  // ---- LSH band index (d28 / d30) ----------------------------------------

  test("band delete: EVERYTHING — read-back empty, partitions dropped") {
    val idx = tmp("alc-band-del-all")
    Dedup.buildBandIndex(docs.filter($"doc_id" < 30), idx)
    Dedup.appendBandIndex(docs.filter($"doc_id" >= 30 && $"doc_id" < 40),
      idx, batchId = "day2")
    Dedup.deleteFromBandIndex(spark, idx,
      docs.filter($"doc_id" < 40).select($"doc_id"))
    assert(Dedup.readBandIndex(spark, idx).count() === 0L)
  }

  test("band delete: NOTHING / missing ids — artifact untouched; TWICE == once") {
    val idx = tmp("alc-band-del-none")
    Dedup.buildBandIndex(docs.filter($"doc_id" < 30), idx)
    val before = Dedup.readBandIndex(spark, idx).collect().map(_.toSeq).toSet
    Dedup.deleteFromBandIndex(spark, idx, docs.limit(0).select($"doc_id"))
    Dedup.deleteFromBandIndex(spark, idx,
      docs.filter($"doc_id" > 100000).select($"doc_id"))
    assert(Dedup.readBandIndex(spark, idx).collect().map(_.toSeq).toSet ===
      before)
    val dels = docs.filter($"doc_id" % 4 === 1).select($"doc_id")
    Dedup.deleteFromBandIndex(spark, idx, dels)
    val once = Dedup.readBandIndex(spark, idx).collect().map(_.toSeq).toSet
    Dedup.deleteFromBandIndex(spark, idx, dels)
    assert(Dedup.readBandIndex(spark, idx).collect().map(_.toSeq).toSet ===
      once)
    assert(once.nonEmpty && once.size < before.size)
  }

  test("incremental probe from an EMPTY index: only new-vs-new pairs can form") {
    val idx = tmp("alc-d30-emptyidx")
    Dedup.buildBandIndex(docs.limit(0), idx)
    // no corpus: result must equal the batch's self-pairs alone — and on
    // a tiny all-distinct batch that is simply "no throw, schema intact"
    val out = Dedup.incrementalLshPairsFromIndex(spark, idx,
      docs.filter($"doc_id" < 5))
    assert(out.columns.toSeq === Seq("d1", "d2", "est_jaccard"))
    out.count() // must execute without schema-inference failure
  }

  test("incremental probe with an EMPTY batch: empty result, index untouched") {
    val idx = tmp("alc-d30-emptybatch")
    Dedup.buildBandIndex(docs.filter($"doc_id" < 20), idx)
    assert(Dedup.incrementalLshPairsFromIndex(spark, idx, docs.limit(0))
      .count() === 0L)
  }

  test("band index: build on an empty corpus reads back empty with the declared schema") {
    val idx = tmp("alc-band-empty")
    Dedup.buildBandIndex(docs.limit(0), idx)
    val back = Dedup.readBandIndex(spark, idx)
    assert(back.count() === 0L)
    assert(back.columns.toSet ===
      Set("doc_id", "sig", "band", "bkey", "batch_id"))
  }

  test("band index: append a real batch into an empty build serves exactly the batch") {
    val idx = tmp("alc-band-appendinto")
    Dedup.buildBandIndex(docs.limit(0), idx)
    val batch = docs.filter($"doc_id" < 10)
    Dedup.appendBandIndex(batch, idx, batchId = "day2")
    val back = Dedup.readBandIndex(spark, idx)
    assert(back.select($"doc_id").distinct().count() ===
      batch.count())
    assert(back.filter($"batch_id" =!= "day2").count() === 0L)
  }

  test("band index: append an EMPTY batch leaves the artifact untouched") {
    val idx = tmp("alc-band-appendempty")
    Dedup.buildBandIndex(docs.filter($"doc_id" < 10), idx)
    val before = Dedup.readBandIndex(spark, idx).collect().map(_.toSeq).toSet
    Dedup.appendBandIndex(docs.limit(0), idx, batchId = "day2")
    assert(Dedup.readBandIndex(spark, idx).collect().map(_.toSeq).toSet ===
      before)
  }

  // ---- versioned IVF index (s16/s17) -------------------------------------

  private def vprobe(root: String, queries: DataFrame): Seq[_] =
    operators.VersionedIvf.probe(spark, root, queries, k = 5, nprobe = 2)
      .orderBy($"qid", $"rank").collect().toSeq

  test("versioned: a writer that dies MID-APPEND leaves the prior snapshot serving") {
    val root = tmp("alc-vivf-crash")
    val corpus = emb.filter($"vec_id" < 60)
    operators.VersionedIvf.build(corpus, root, nlist = 4)
    val qs = emb.filter($"vec_id" < 3)
    val before = vprobe(root, qs)
    // simulate the crash window: the writer landed data AND staged the
    // manifest but died before the pointer flip — readers must resolve
    // the OLD version untouched
    val orphanData = java.nio.file.Paths.get(root, "data", "v00000002-append",
      "cid=0", "batch_id=day2")
    java.nio.file.Files.createDirectories(orphanData)
    java.nio.file.Files.writeString(orphanData.resolve("part-garbage.parquet"),
      "not parquet at all")
    graft.sources.VersionedArtifact.stage(root, "v00000002", Seq(
      "centroids data/v00000001-cents",
      "batch base", "batch day2",
      "leaf 0 day2 data/v00000002-append/cid=0/batch_id=day2"))
    assert(vprobe(root, qs) === before,
      "a staged-but-unpublished version leaked into the read path")
    // the RETRIED append commits a fresh version past the orphan and wins
    operators.VersionedIvf.append(spark,
      emb.filter($"vec_id" >= 60 && $"vec_id" < 80), root, "day2")
    val after = vprobe(root, qs)
    assert(after !== before, "retried append after the crash never landed")
  }

  test("versioned: vacuum never touches what the live version serves") {
    val root = tmp("alc-vivf-vacuum")
    val corpus = emb.filter($"vec_id" < 60)
    operators.VersionedIvf.build(corpus, root, nlist = 4)
    operators.VersionedIvf.append(spark,
      emb.filter($"vec_id" >= 60 && $"vec_id" < 80), root, "day2")
    operators.VersionedIvf.compact(spark, root)
    val qs = emb.filter($"vec_id" < 3)
    val before = vprobe(root, qs)
    val removed = operators.VersionedIvf.vacuum(root, keepVersions = 1)
    // superseded build/append postings are reclaimed; the compacted
    // segment and the centroids the live manifest references survive
    assert(removed.exists(_.contains("-build")),
      s"vacuum reclaimed nothing: $removed")
    assert(!removed.exists(_.contains("-compact")))
    assert(!removed.exists(_.contains("-cents")))
    assert(vprobe(root, qs) === before, "vacuum broke the live snapshot")
    // idempotent: nothing left to reclaim
    assert(operators.VersionedIvf.vacuum(root, keepVersions = 1).isEmpty)
  }

  test("versioned: exactly-once append — a replayed batch id is a metadata no-op") {
    val root = tmp("alc-vivf-replay")
    operators.VersionedIvf.build(emb.filter($"vec_id" < 60), root, nlist = 4)
    val batch = emb.filter($"vec_id" >= 60 && $"vec_id" < 80)
    val v1 = operators.VersionedIvf.append(spark, batch, root, "day2")
    val v2 = operators.VersionedIvf.append(spark, batch, root, "day2")
    assert(v1 === v2, "replayed append committed a new version")
    assert(graft.sources.VersionedArtifact.currentName(root) === Some(v1))
  }

  test("versioned: degenerate lifecycle — empty build, append-into-empty, retrain-on-empty") {
    val root = tmp("alc-vivf-empty")
    operators.VersionedIvf.build(emb.limit(0), root, nlist = 4)
    assert(vprobe(root, emb.filter($"vec_id" < 3)).isEmpty)
    // no centroids trained: a later batch has nothing to assign against
    operators.VersionedIvf.append(spark, emb.filter($"vec_id" < 20), root, "day2")
    assert(vprobe(root, emb.filter($"vec_id" < 3)).isEmpty)
    // retrain over zero postings: commits an empty quantizer, no throw
    operators.VersionedIvf.retrain(spark, root)
    assert(vprobe(root, emb.filter($"vec_id" < 3)).isEmpty)
    // delete on empty: metadata no-op
    operators.VersionedIvf.delete(spark, root, emb.limit(0).select($"vec_id"))
    assert(vprobe(root, emb.filter($"vec_id" < 3)).isEmpty)
  }

  test("versioned: delete-everything then probe — empty, and batch ids stay committed") {
    val root = tmp("alc-vivf-delall")
    val corpus = emb.filter($"vec_id" < 40)
    operators.VersionedIvf.build(corpus, root, nlist = 4)
    operators.VersionedIvf.delete(spark, root, corpus.select($"vec_id"))
    assert(vprobe(root, emb.filter($"vec_id" < 3)).isEmpty)
    // the committed "base" batch id survives the takedown — a replayed
    // build-batch append would still be refused as already-committed
    val m = operators.VersionedIvf.currentManifest(root).get
    assert(m.batches === Seq("base"))
    assert(m.leaves.isEmpty)
  }

  test("versioned band: crash window serves prior snapshot; replay no-op; empty build") {
    val root = tmp("alc-vband")
    operators.VersionedBand.build(docs.filter($"doc_id" < 30), root)
    val before = operators.VersionedBand.readLive(spark, root)
      .collect().map(_.toSeq).toSet
    // crash window: stage a manifest without flipping — readers keep v1
    graft.sources.VersionedArtifact.stage(root, "v00000002", Seq(
      "batch base", "batch day2",
      "leaf day2 data/v00000002-append/batch_id=day2"))
    assert(operators.VersionedBand.readLive(spark, root)
      .collect().map(_.toSeq).toSet === before)
    // exactly-once: the same batch id twice commits once
    val batch = docs.filter($"doc_id" >= 30 && $"doc_id" < 40)
    val v1 = operators.VersionedBand.append(spark, batch, root, "day2")
    val v2 = operators.VersionedBand.append(spark, batch, root, "day2")
    assert(v1 === v2)
    // empty build: read-back empty with declared schema, no throw
    val root2 = tmp("alc-vband-empty")
    operators.VersionedBand.build(docs.limit(0), root2)
    assert(operators.VersionedBand.readLive(spark, root2).count() === 0L)
    operators.VersionedBand.delete(spark, root2, docs.limit(0).select($"doc_id"))
    assert(operators.VersionedBand.readLive(spark, root2).count() === 0L)
  }

  // ---- trained-tokenizer artifact (t18/t19/e07) --------------------------

  test("BPE artifact: train on an empty corpus — loads empty, encode gives every doc a 0-count row") {
    val dir = tmp("alc-bpe-empty")
    TextOps.bpeSaveTrained(docs.limit(0), dir, merges = 4)
    assert(TextOps.bpeLoadMerges(spark, dir).count() === 0L)
    assert(TextOps.bpeLoadVocab(spark, dir).count() === 0L)
    // encoding real docs against the empty vocabulary: every document
    // keeps its row with zero counts (the left-join contract), because a
    // downstream packer must see the full doc set either way
    val enc = TextOps.bpeEncodeWith(docs.filter($"doc_id" < 5),
      TextOps.bpeLoadVocab(spark, dir)).collect()
    assert(enc.length === docs.filter($"doc_id" < 5).count().toInt)
    assert(enc.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
  }

  test("BPE artifact: encode ZERO docs against a real vocabulary — empty result, no throw") {
    val dir = tmp("alc-bpe-zerodocs")
    TextOps.bpeSaveTrained(docs.filter($"doc_id" < 20), dir, merges = 4)
    assert(TextOps.bpeEncodeWith(docs.limit(0),
      TextOps.bpeLoadVocab(spark, dir)).count() === 0L)
  }
}
