package graft.operators

import graft.sources.{CommitConflictException, VersionedArtifact}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The LSH band index under VERSION-POINTER commits — [[VersionedIvf]]'s
  * protocol applied to the d28 artifact (r12 verdict #2 named BOTH
  * indexes): every operation lands immutable leaves plus a manifest and
  * atomically flips CURRENT, so a dedup probe concurrent with a writer
  * reads one committed snapshot, a crashed writer leaves the prior
  * version serving, appends are EXACTLY-ONCE by manifest batch-id
  * membership, compaction is a swap, and vacuum reclaims superseded
  * state. Commits are CAS-protected against CONCURRENT writers (r13
  * verdict #1): each manifest records its base version,
  * [[VersionedArtifact.stage]] claims the version name exclusively, and
  * publish refuses a moved base — [[append]] retries from the new live
  * snapshot (reusing its written segment: band rows are a pure function
  * of the batch, independent of artifact state), while build/delete/
  * compact surface the retryable [[CommitConflictException]] to their
  * scheduler. Segment dirs carry a writer token, so racing writers never
  * cross-write a staging directory. A rebuild carries the prior
  * manifest's committed batch ids forward (r13 ADVICE), keeping replays
  * no-ops across full rebuilds. The band rows themselves are
  * [[Dedup.bandTable]]'s, unchanged — d32 certifies the whole chain
  * against the same from-scratch rebuild oracle as d28/d31, and d33
  * probes a committed snapshot with a day-3 batch.
  *
  * Manifest lines: `batch <id>` (committed batch ids) and
  * `leaf <batchLabel> <relpath>` — a leaf is one batch's band rows from
  * one operation (`batch_id=<b>` dir). Every segment writer partitions
  * by batch_id, so even compacted leaves keep their batch labels and a
  * post-compaction delete stays leaf-localized; the `*` label is
  * accepted on read as a whole-segment leaf for forward compatibility. */
object VersionedBand {

  final case class Leaf(batch: String, path: String)
  final case class Manifest(leaves: Seq[Leaf], batches: Seq[String])

  private def render(m: Manifest): Seq[String] =
    m.batches.map(b => s"batch $b") ++
      m.leaves.map(l => s"leaf ${l.batch} ${l.path}")

  private def parse(lines: Seq[String]): Manifest = {
    val leaves = Seq.newBuilder[Leaf]
    val batches = Seq.newBuilder[String]
    lines.foreach { ln =>
      ln.split("\\s+").toSeq match {
        case Seq("batch", b) => batches += b
        case Seq("leaf", b, p) => leaves += Leaf(b, p)
        case _ => throw new IllegalArgumentException(s"bad manifest line: $ln")
      }
    }
    Manifest(leaves.result(), batches.result())
  }

  def currentManifest(root: String): Option[Manifest] =
    currentSnapshot(root).map(_._2)

  /** (version, manifest) resolved together — see [[VersionedIvf]]. */
  private def currentSnapshot(root: String): Option[(String, Manifest)] =
    VersionedArtifact.currentName(root)
      .map(v => (v, parse(VersionedArtifact.readManifest(root, v))))

  private def liveSnapshot(root: String): (String, Manifest) =
    currentSnapshot(root).getOrElse(throw new IllegalStateException(
      s"no committed version under $root — build first"))

  private val segSeq = new java.util.concurrent.atomic.AtomicLong()
  private def segToken(): String =
    s"w${ProcessHandle.current().pid()}x${segSeq.incrementAndGet()}"

  private def listLeafDirs(root: String, segRel: String): Seq[Leaf] = {
    import scala.jdk.CollectionConverters._
    val seg = java.nio.file.Paths.get(root, segRel)
    if (!java.nio.file.Files.isDirectory(seg)) return Seq.empty
    val s = java.nio.file.Files.list(seg)
    val batchDirs =
      try s.iterator().asScala.toSeq
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("batch_id="))
      finally s.close()
    batchDirs.map { bd =>
      val b = bd.getFileName.toString.stripPrefix("batch_id=")
      Leaf(b, s"$segRel/batch_id=$b")
    }
  }

  private def emptyBands(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      Dedup.bandIndexSchema)

  /** The band rows a snapshot serves: one declared-schema read per
    * segment over its manifest-named leaf dirs (basePath resolves
    * batch_id from the path); a compacted segment (label `*`) reads
    * whole, batch_id in-row. Half-landed writer dirs are invisible — no
    * manifest names them. With `asOf`, resolves a pinned PUBLISHED
    * version instead of CURRENT (time travel): a long-running consumer
    * keeps one snapshot while maintenance publishes past it, protected
    * by vacuum's retention grace window. */
  def readLive(spark: SparkSession, root: String,
      asOf: Option[String] = None): DataFrame =
    readLeaves(spark, root,
      parse(VersionedArtifact.resolveManifestLines(root, asOf)).leaves)

  private def readLeaves(spark: SparkSession, root: String,
      leaves: Seq[Leaf]): DataFrame = {
    val bySeg = leaves.groupBy(_.path.split("/").take(2).mkString("/"))
      .toSeq.sortBy(_._1)
    val parts = bySeg.map { case (seg, ls) =>
      val paths =
        if (ls.exists(_.batch == "*")) Seq(s"$root/$seg")
        else ls.map(l => s"$root/${l.path}")
      spark.read.schema(Dedup.bandIndexSchema)
        .option("basePath", s"$root/$seg")
        .parquet(paths: _*)
        .select(col("doc_id"), col("sig"), col("band"), col("bkey"),
          col("batch_id"))
    }
    if (parts.isEmpty) emptyBands(spark) else parts.reduce(_ unionByName _)
  }

  private def writeSegment(rows: DataFrame, root: String,
      segRel: String): Seq[Leaf] = {
    rows.write.mode("overwrite").partitionBy("batch_id")
      .parquet(s"$root/$segRel")
    listLeafDirs(root, segRel)
  }

  /** Build v1, or a full rebuild as v(n+1) — carrying committed batch
    * ids forward so exactly-once survives the rebuild (r13 ADVICE). */
  def build(docs: DataFrame, root: String, bands: Int = 8): String = {
    val prior = currentSnapshot(root)
    val base = prior.map(_._1)
    val ver = VersionedArtifact.nextName(root)
    val leaves = writeSegment(
      Dedup.bandTable(docs, bands).withColumn("batch_id", lit("base")),
      root, s"data/$ver-build-${segToken()}")
    val batches =
      (prior.map(_._2.batches).getOrElse(Seq.empty) :+ "base").distinct
    VersionedArtifact.stage(root, ver, render(Manifest(leaves, batches)), base)
    VersionedArtifact.publish(root, ver)
    ver
  }

  /** Batch-sized append, EXACTLY-ONCE by manifest membership — a
    * replayed batch id returns without writing, even after compaction
    * rewrote the physical leaves. Retries internally on a commit
    * conflict, reusing the written segment (band rows are batch-pure,
    * independent of artifact state) — a lost race costs one metadata
    * round, never a rewrite. */
  def append(spark: SparkSession, newDocs: DataFrame, root: String,
      batchId: String, bands: Int = 8): String = {
    require(batchId != "base" && batchId != "*",
      s"append: batch id '$batchId' is reserved")
    var (base, m) = liveSnapshot(root)
    if (m.batches.contains(batchId)) return base
    val newLeaves = writeSegment(
      Dedup.bandTable(newDocs, bands).withColumn("batch_id", lit(batchId)),
      root, s"data/${VersionedArtifact.nextName(root)}-append-${segToken()}")
    var attempt = 0
    while (true) {
      val ver = VersionedArtifact.nextName(root)
      try {
        VersionedArtifact.stage(root, ver,
          render(Manifest(m.leaves ++ newLeaves, m.batches :+ batchId)),
          Some(base))
        VersionedArtifact.publish(root, ver)
        return ver
      } catch {
        case e: CommitConflictException =>
          attempt += 1
          if (attempt > 20) throw e
          val (base2, m2) = liveSnapshot(root)
          if (m2.batches.contains(batchId)) return base2 // raced duplicate
          base = base2; m = m2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Snapshot-isolated takedown: survivors of only the leaves holding
    * deleted docs rewrite into a fresh segment; untouched leaves carry
    * over by reference; committed batch ids are kept so a post-takedown
    * replay of the batch stays a no-op. CAS-committed — a concurrent
    * committed writer surfaces a retryable [[CommitConflictException]]
    * to the takedown scheduler. */
  def delete(spark: SparkSession, root: String, docIds: DataFrame): String = {
    val (base, m) = liveSnapshot(root)
    val ids = broadcast(docIds.select(col("doc_id")).distinct())
    val hitBatches = readLeaves(spark, root, m.leaves)
      .join(ids, Seq("doc_id"), "left_semi")
      .select(col("batch_id")).distinct().collect().map(_.getString(0)).toSet
    // a `*` whole-segment leaf (forward compat) is conservatively
    // affected by any hit; normal leaves only when their batch was hit
    val (affected, untouched) = m.leaves.partition(l =>
      l.batch == "*" || hitBatches(l.batch))
    if (hitBatches.isEmpty) return base
    val ver = VersionedArtifact.nextName(root)
    val survivors = readLeaves(spark, root, affected)
      .join(ids, Seq("doc_id"), "left_anti")
    val newLeaves = writeSegment(survivors, root,
      s"data/$ver-delete-${segToken()}")
    VersionedArtifact.stage(root, ver,
      render(Manifest(untouched ++ newLeaves, m.batches)), Some(base))
    VersionedArtifact.publish(root, ver)
    ver
  }

  /** Compaction as a swap: the live rows rewrite into one segment (one
    * leaf per batch partition, small files collapsed); the pointer
    * flips; superseded dirs wait for [[vacuum]]. CAS-committed — losing
    * to a concurrent append surfaces a retryable
    * [[CommitConflictException]] (re-run over the grown snapshot; the
    * appender can never lose its leaves to us). */
  def compact(spark: SparkSession, root: String): String = {
    val (base, m) = liveSnapshot(root)
    val ver = VersionedArtifact.nextName(root)
    val newLeaves = writeSegment(
      readLeaves(spark, root, m.leaves).repartition(col("batch_id")),
      root, s"data/$ver-compact-${segToken()}")
    VersionedArtifact.stage(root, ver,
      render(Manifest(newLeaves, m.batches)), Some(base))
    VersionedArtifact.publish(root, ver)
    ver
  }

  def vacuum(root: String, keepVersions: Int = 2): Seq[String] =
    VersionedArtifact.vacuumDataDirs(root, keepVersions)
}
