package graft.operators

import graft.sources.{CommitConflictException, VersionedArtifact}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** The IVF ANN index under VERSION-POINTER commits (r12 verdict #2/#3/#8)
  * — the concurrent-reader-safe sibling of the in-place s10–s15 lifecycle.
  *
  * Every operation (build / append / delete / compact / retrain) lands a
  * COMPLETE new snapshot — immutable data dirs plus a manifest naming
  * exactly the leaves the snapshot serves — and then atomically flips the
  * artifact's CURRENT pointer ([[VersionedArtifact]]). A probe resolves
  * the pointer once and reads only manifest-named directories, so it
  * observes one committed snapshot even while a writer lands the next
  * one, and a writer that crashes mid-operation leaves the prior version
  * serving — its half-landed data dirs are invisible (no manifest names
  * them) and get reclaimed by [[vacuum]] once superseded.
  *
  * CONCURRENT WRITERS (r13 verdict #1): every commit records the BASE
  * version it was derived from and publishes via [[VersionedArtifact]]'s
  * compare-and-swap, so two writers racing (a streaming appender vs a
  * periodic compactor, two appenders) produce exactly one winner per
  * version and a retryable [[CommitConflictException]] for the loser —
  * never a lost update. [[append]] RETRIES internally: on a conflict it
  * re-reads the live snapshot, re-checks batch membership (the other
  * writer may have committed the same batch), reuses its already-written
  * segment when the quantizer is unchanged (a conflict with another
  * append/delete/compact costs one metadata round), and re-assigns the
  * batch only if a retrain/rebuild won the race and moved the centroids.
  * The maintenance ops (build/delete/compact/retrain) surface the
  * conflict to their scheduler — a coordinator that lost to an append
  * re-runs against the grown snapshot by re-invoking the op. Segment
  * dirs are writer-unique (`data/<ver>-<op>-w<pid>…`), so racing writers
  * never cross-write one directory; a crashed writer's half-landed
  * segment is an orphan vacuum reclaims once its version tag is
  * superseded.
  *
  * Manifest lines (plain text — the format is this object's contract):
  * {{{
  *   centroids data/<ver>-cents-<w>
  *   batch <batchId>                            — committed batch ids
  *   leaf <cid> <batchLabel> data/<ver>-<op>-<w>/cid=<cid>[/batch_id=<b>]
  * }}}
  * A leaf is one immutable directory holding one cell's postings from
  * one operation; `batchLabel` is the physical batch partition ("base",
  * "day2", …) or `*` for a compacted leaf that carries batch lineage
  * in-row. The `batch` lines make append EXACTLY-ONCE by manifest
  * membership — a replayed foreachBatch trigger whose id is already
  * committed is a no-op even after a compaction has rewritten the
  * physical leaves (the in-place index can't offer that: its only
  * idempotence is the dynamic-overwrite rewrite itself). A full
  * [[build]] over an existing artifact CARRIES FORWARD the committed
  * batch ids (r13 ADVICE), so exactly-once survives a rebuild whose
  * corpus already contains those batches' rows.
  *
  * Scale shape: append/delete write only batch/affected-leaf-sized data;
  * a new version's manifest REFERENCES the untouched leaves instead of
  * copying them (the Iceberg/Delta snapshot shape), so commit cost is
  * metadata-sized (measured in `ScaleSmoke --s16-only`). A probe reads
  * the nprobe probed cells' leaf dirs by explicit manifest selection —
  * stronger than catalog partition pruning (nothing to mis-estimate) and
  * exactly the collected-IN-list convention the in-place probe already
  * pins. Reads accept `asOf` — a published version name — for pinned
  * (time-travel) scans: a long-running consumer keeps one snapshot while
  * maintenance publishes past it, protected by vacuum's grace window.
  * Reference for semantics: the in-place operators in [[Similarity]];
  * s16/s17 certify the whole versioned chain against the same
  * frozen-centroid rebuild oracle.
  */
object VersionedIvf {

  /** One immutable leaf: a cell's postings dir from one operation.
    * `batch` is the physical partition label, or "*" for compacted
    * leaves whose rows carry their original batch_id in-row. */
  final case class Leaf(cid: Long, batch: String, path: String)

  final case class Manifest(centroids: String, leaves: Seq[Leaf],
      batches: Seq[String])

  private def render(m: Manifest): Seq[String] =
    Seq(s"centroids ${m.centroids}") ++
      m.batches.map(b => s"batch $b") ++
      m.leaves.map(l => s"leaf ${l.cid} ${l.batch} ${l.path}")

  private def parse(lines: Seq[String]): Manifest = {
    var cents = ""
    val leaves = Seq.newBuilder[Leaf]
    val batches = Seq.newBuilder[String]
    lines.foreach { ln =>
      ln.split("\\s+").toSeq match {
        case Seq("centroids", p) => cents = p
        case Seq("batch", b) => batches += b
        case Seq("leaf", cid, b, p) => leaves += Leaf(cid.toLong, b, p)
        case _ => throw new IllegalArgumentException(s"bad manifest line: $ln")
      }
    }
    require(cents.nonEmpty, "manifest names no centroids")
    Manifest(cents, leaves.result(), batches.result())
  }

  /** The live snapshot, if the artifact has ever committed. */
  def currentManifest(root: String): Option[Manifest] =
    currentSnapshot(root).map(_._2)

  /** (version, manifest) resolved TOGETHER — the pointer is read once and
    * that version's (immutable) manifest parsed, so a concurrent flip
    * between the two reads can never pair a new name with an old body. */
  private def currentSnapshot(root: String): Option[(String, Manifest)] =
    VersionedArtifact.currentName(root)
      .map(v => (v, parse(VersionedArtifact.readManifest(root, v))))

  private def liveSnapshot(root: String): (String, Manifest) =
    currentSnapshot(root).getOrElse(throw new IllegalStateException(
      s"no committed version under $root — build first"))

  /** Resolve the manifest a read should serve: CURRENT, or a pinned
    * (time-travel) PUBLISHED version — the rule lives in
    * [[VersionedArtifact.resolveManifestLines]]. */
  private def resolveManifest(root: String, asOf: Option[String]): Manifest =
    parse(VersionedArtifact.resolveManifestLines(root, asOf))

  /** A writer-unique segment suffix: racing writers must never address
    * the same staging directory (two Spark overwrite-writes to one path
    * corrupt both). Orphans from crashed attempts are version-tagged and
    * age out via [[vacuum]]. */
  private def segToken(): String = VersionedArtifact.segToken()

  // ---- physical IO -----------------------------------------------------

  /** Enumerate the (cid[, batch]) leaf dirs a segment write produced —
    * one driver-side listing per level (a FileSystem listStatus pair in
    * production), metadata-sized. */
  private def listLeafDirs(root: String, segRel: String): Seq[Leaf] = {
    import scala.jdk.CollectionConverters._
    val seg = java.nio.file.Paths.get(root, segRel)
    if (!java.nio.file.Files.isDirectory(seg)) return Seq.empty
    def ls(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.list(p)
      try s.iterator().asScala.toSeq.filter(java.nio.file.Files.isDirectory(_))
      finally s.close()
    }
    ls(seg).filter(_.getFileName.toString.startsWith("cid=")).flatMap { cd =>
      val cid = cd.getFileName.toString.stripPrefix("cid=").toLong
      val batchDirs = ls(cd).filter(_.getFileName.toString.startsWith("batch_id="))
      if (batchDirs.isEmpty) Seq(Leaf(cid, "*", s"$segRel/cid=$cid"))
      else batchDirs.map { bd =>
        val b = bd.getFileName.toString.stripPrefix("batch_id=")
        Leaf(cid, b, s"$segRel/cid=$cid/batch_id=$b")
      }
    }
  }

  private def segmentOf(leafPath: String): String =
    leafPath.split("/").take(2).mkString("/")

  private def emptyPostings(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      Similarity.postingsSchema)

  /** Read the given leaves as one postings stream — one declared-schema
    * read per SEGMENT (per-operation dir), leaf dirs passed explicitly
    * with the segment as basePath so `cid`/`batch_id` partition values
    * resolve from the path; compacted segments carry batch_id in-row
    * instead. Reads ONLY manifest-named directories — a half-landed
    * writer dir is invisible by construction. */
  private def readLeaves(spark: SparkSession, root: String,
      leaves: Seq[Leaf]): DataFrame = {
    val bySeg = leaves.groupBy(l => segmentOf(l.path)).toSeq.sortBy(_._1)
    val parts = bySeg.map { case (seg, ls) =>
      spark.read.schema(Similarity.postingsSchema)
        .option("basePath", s"$root/$seg")
        .parquet(ls.map(l => s"$root/${l.path}"): _*)
        .select(col("vec_id"), col("e"), col("nrm"),
          col("cid").cast("long").as("cid"), col("batch_id"))
    }
    if (parts.isEmpty) emptyPostings(spark)
    else parts.reduce(_ unionByName _)
  }

  /** The postings a snapshot serves, as one DataFrame — the read the
    * spec/ledger arms certify against the rebuild oracle. */
  def livePostings(spark: SparkSession, root: String,
      asOf: Option[String] = None): DataFrame =
    readLeaves(spark, root, resolveManifest(root, asOf).leaves)

  private def readCentroids(spark: SparkSession, root: String,
      m: Manifest): DataFrame =
    spark.read.schema(Similarity.centroidsSchema)
      .parquet(s"$root/${m.centroids}")

  /** Score + assign a corpus against centroids and land it as one
    * partitioned segment; returns the segment's leaves. The segment name
    * carries the writer token, so concurrent writers never collide on a
    * staging directory. */
  private def writeSegment(spark: SparkSession, corpus: DataFrame,
      cents: DataFrame, root: String, segRel: String,
      batchId: Option[String]): Seq[Leaf] = {
    // in-row assignment (r16, see [[Similarity.assignCells]]): the former
    // argmax-exchange + vec_id join-back re-shuffled the corpus vectors
    // to attach one small column; the fold over the broadcast centroid
    // list is one narrow pass, and every lifecycle segment write pays it
    val assigned = Similarity.assignCells(corpus, cents)
    val rows = batchId match {
      case Some(b) => assigned.select(col("vec_id"), col("e"), col("nrm"),
        col("cid"), lit(b).as("batch_id"))
      case None => assigned.select(col("vec_id"), col("e"), col("nrm"),
        col("cid"), col("batch_id"))
    }
    rows.write.mode("overwrite").partitionBy("cid", "batch_id")
      .parquet(s"$root/$segRel")
    listLeafDirs(root, segRel)
  }

  // ---- lifecycle operations -------------------------------------------

  /** Build version 1 (or a full rebuild as version n+1): centroids +
    * postings land under the new version's data dirs, then the pointer
    * flips (CAS against the pre-build version — a rebuild that lost a
    * race to another writer surfaces [[CommitConflictException]]).
    * `centroidSource` is the frozen-training split, as in
    * [[Similarity.buildIvfIndex]]. On a REBUILD over an existing
    * artifact the prior manifest's committed batch ids carry forward
    * (r13 ADVICE): a replayed append of a batch whose rows the rebuild
    * corpus already contains stays a no-op. Returns the committed
    * version. */
  def build(emb: DataFrame, root: String, nlist: Int = 8,
      centroidSource: Option[DataFrame] = None): String = {
    val spark = emb.sparkSession
    graft.plans.GraftFunctions.register(spark)
    val prior = currentSnapshot(root)
    val base = prior.map(_._1)
    val ver = VersionedArtifact.nextName(root)
    val w = segToken()
    val centsRel = s"data/$ver-cents-$w"
    val corpus = Similarity.prepCorpus(emb)
    val cents = Similarity.prepCentroids(centroidSource.getOrElse(emb), nlist)
    cents.write.mode("overwrite").parquet(s"$root/$centsRel")
    val leaves = writeSegment(spark, corpus, cents, root,
      s"data/$ver-build-$w", Some("base"))
    val batches =
      (prior.map(_._2.batches).getOrElse(Seq.empty) :+ "base").distinct
    VersionedArtifact.stage(root, ver,
      render(Manifest(centsRel, leaves, batches)), base)
    VersionedArtifact.publish(root, ver)
    ver
  }

  /** Append a batch against the FROZEN live centroids — batch-sized
    * work, metadata-sized commit. EXACTLY-ONCE by manifest membership:
    * a batch id the live version already committed returns without
    * writing (the replayed-foreachBatch contract, surviving compaction
    * because the id is carried in the manifest, not the dir layout).
    * Retries internally on a commit conflict (see the object doc): the
    * written segment is reused unless a racing retrain/rebuild moved the
    * centroids, in which case the batch re-assigns against the new
    * quantizer before re-staging. */
  def append(spark: SparkSession, newEmb: DataFrame, root: String,
      batchId: String): String = {
    require(batchId != "base" && batchId != "*",
      s"append: batch id '$batchId' is reserved")
    graft.plans.GraftFunctions.register(spark)
    val corpus = Similarity.prepCorpus(newEmb)
    var (base, m) = liveSnapshot(root)
    if (m.batches.contains(batchId)) return base
    // segment written once against the base quantizer; re-derived below
    // only if the quantizer itself moved
    var segCents = m.centroids
    var newLeaves = writeSegment(spark, corpus,
      readCentroids(spark, root, m), root,
      s"data/${VersionedArtifact.nextName(root)}-append-${segToken()}",
      Some(batchId))
    var attempt = 0
    while (true) {
      val ver = VersionedArtifact.nextName(root)
      try {
        VersionedArtifact.stage(root, ver, render(Manifest(m.centroids,
          m.leaves ++ newLeaves, m.batches :+ batchId)), Some(base))
        VersionedArtifact.publish(root, ver)
        return ver
      } catch {
        case e: CommitConflictException =>
          attempt += 1
          if (attempt > 20) throw e
          val (base2, m2) = liveSnapshot(root)
          if (m2.batches.contains(batchId)) return base2 // raced duplicate
          if (m2.centroids != segCents) {
            // a retrain/rebuild won the race: cell assignment is a
            // function of the quantizer, so the segment must re-derive
            segCents = m2.centroids
            newLeaves = writeSegment(spark, corpus,
              readCentroids(spark, root, m2), root,
              s"data/${VersionedArtifact.nextName(root)}-append-${segToken()}",
              Some(batchId))
          }
          base = base2; m = m2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** TAKEDOWN, snapshot-isolated: survivors of ONLY the leaves holding
    * deleted ids are rewritten into a fresh segment; the new manifest
    * references the untouched leaves and drops the affected ones (an
    * emptied leaf simply has no successor). Old files are never touched
    * — a concurrent reader on the prior version keeps its snapshot; the
    * committed batch ids are KEPT so a post-takedown replay of that
    * batch is still a no-op. The affected-leaf probe is one
    * pushdown-filtered scan of the live postings (min/max stats prune
    * most files at scale); the REWRITE is affected-leaf-sized. Commits
    * by CAS — a concurrent committed writer surfaces a retryable
    * [[CommitConflictException]] to the takedown scheduler. */
  def delete(spark: SparkSession, root: String, vecIds: DataFrame): String = {
    graft.plans.GraftFunctions.register(spark)
    val (base, m) = liveSnapshot(root)
    val ids = broadcast(vecIds.select(col("vec_id")).distinct())
    // Which leaves hold a deleted id — ONE probe job over every segment
    // (r16 optimization, r15 verdict #5): the per-segment reads (each its
    // own basePath so cid/batch_id resolve from the path) union into one
    // frame tagged with its segment, so the affected-leaf probe is a
    // single semi-join + distinct + collect instead of one driver-blocking
    // job per segment — the commit still probes, rewrites and publishes
    // exactly as before, just without #segments job round trips.
    val bySeg = m.leaves.groupBy(l => segmentOf(l.path)).toSeq.sortBy(_._1)
    val perSeg = bySeg.map { case (seg, ls) =>
      spark.read.schema(Similarity.postingsSchema)
        .option("basePath", s"$root/$seg")
        .parquet(ls.map(l => s"$root/${l.path}"): _*)
        .select(lit(seg).as("__seg"), col("vec_id"),
          col("cid").cast("long").as("cid"), col("batch_id"))
    }
    val hit = scala.collection.mutable.Set.empty[String] // leaf paths
    if (perSeg.nonEmpty) {
      val touched = perSeg.reduce(_ unionByName _)
        .join(ids, Seq("vec_id"), "left_semi")
        .select(col("__seg"), col("cid"), col("batch_id")).distinct()
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      bySeg.foreach { case (seg, ls) =>
        ls.foreach { l =>
          if (touched.exists { case (s, c, b) =>
              s == seg && c == l.cid && (l.batch == "*" || b == l.batch) })
            hit += l.path
        }
      }
    }
    if (hit.isEmpty) return base
    val (affected, untouched) = m.leaves.partition(l => hit(l.path))
    val ver = VersionedArtifact.nextName(root)
    val segRel = s"data/$ver-delete-${segToken()}"
    val survivors = readLeaves(spark, root, affected)
      .join(ids, Seq("vec_id"), "left_anti")
    survivors.write.mode("overwrite").partitionBy("cid", "batch_id")
      .parquet(s"$root/$segRel")
    val newLeaves = listLeafDirs(root, segRel)
    VersionedArtifact.stage(root, ver, render(Manifest(m.centroids,
      untouched ++ newLeaves, m.batches)), Some(base))
    VersionedArtifact.publish(root, ver)
    ver
  }

  /** Compaction as a REAL SWAP (the r12 gap: the in-place compactor
    * writes a copy with no publish protocol): the live postings rewrite
    * one-task-per-cell into a single segment — one file per cell, batch
    * lineage in-row — and the pointer flips to it. Probes in flight keep
    * the old leaves; the superseded dirs wait for [[vacuum]]. Commits by
    * CAS — losing to a concurrent append surfaces a retryable
    * [[CommitConflictException]] (re-run compaction over the grown
    * snapshot; the appender can never lose ITS leaves to us). */
  def compact(spark: SparkSession, root: String): String = {
    val (base, m) = liveSnapshot(root)
    val ver = VersionedArtifact.nextName(root)
    val segRel = s"data/$ver-compact-${segToken()}"
    readLeaves(spark, root, m.leaves)
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$root/$segRel")
    VersionedArtifact.stage(root, ver, render(Manifest(m.centroids,
      listLeafDirs(root, segRel), m.batches)), Some(base))
    VersionedArtifact.publish(root, ver)
    ver
  }

  /** RETRAIN — the acting arm s14's drift monitor was missing (r12
    * verdict #3): one exact Lloyd step over the live postings. New
    * centroid for cell c = the coordinate-wise MEAN of c's current
    * members, computed over exact integer micro-units (per-row
    * round(e_j·10⁶) summed as BIGINT, divided by n·10⁶) so the trained
    * doubles are bit-identical in any engine — the determinism that
    * makes retrain oracle-checkable where iterative FP k-means is not.
    * The whole live corpus then re-indexes against the new centroids
    * into one fresh version (original batch lineage preserved in-row).
    * Corpus-sized BY NATURE — retrain is the rare op the monitor
    * triggers, priced like a build, never like an append; the win it
    * buys (recall recovered on drifted data) is measured in
    * `ScaleSmoke --retrain-only`. Cells emptied of members (or with an
    * exactly-zero mean, e.g. an antipodal pair) drop out of the new
    * quantizer — deterministically, because the zero test is on exact
    * integers. CAS-committed, like [[compact]]. */
  def retrain(spark: SparkSession, root: String): String = {
    graft.plans.GraftFunctions.register(spark)
    val (base, m) = liveSnapshot(root)
    val ver = VersionedArtifact.nextName(root)
    val w = segToken()
    val live = readLeaves(spark, root, m.leaves)
    // exact per-(cell, coordinate) micro-sums -> bit-portable means
    val sums = live
      .select(col("cid"), posexplode(col("e")).as(Seq("j", "v")))
      .groupBy(col("cid"), col("j"))
      .agg(sum(round(col("v") * 1e6).cast("long")).as("s"),
        count(lit(1)).as("n"))
    val cents1 = sums
      .select(col("cid"), col("j"),
        (col("s").cast("double") / (col("n") * lit(1e6))).as("cv"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("j"), col("cv")))).as("jcv"))
      .select(col("cid"), transform(col("jcv"), x => x.getField("cv")).as("ce"))
      .filter(VectorFns.nonZero(col("ce")))
      .withColumn("cnrm", VectorFns.norm(col("ce")))
    val centsRel = s"data/$ver-cents-$w"
    cents1.write.mode("overwrite").parquet(s"$root/$centsRel")
    val centsBack = spark.read.schema(Similarity.centroidsSchema)
      .parquet(s"$root/$centsRel") // the artifact IS the quantizer
    val corpus = live.select(col("vec_id"), col("e"), col("nrm"), col("batch_id"))
    val newLeaves = writeSegment(spark, corpus, centsBack, root,
      s"data/$ver-retrain-$w", None)
    VersionedArtifact.stage(root, ver,
      render(Manifest(centsRel, newLeaves, m.batches)), Some(base))
    VersionedArtifact.publish(root, ver)
    ver
  }

  // ---- read path -------------------------------------------------------

  /** Probe the LIVE version (or, with `asOf`, a pinned published one) —
    * s05's exact protocol over manifest-named leaves: the pointer
    * resolves once, probed cells select manifest entries explicitly
    * (nprobe cells' dirs read, nothing else), and the ranking is
    * [[Similarity.rankProbe]] — identical scoring, rounding and
    * tie-breaks, so versioned probe == in-place probe == rebuild oracle
    * (s16). A pinned reader is unaffected by concurrent publishes and by
    * vacuum inside the retention grace window. */
  def probe(spark: SparkSession, root: String, queries: DataFrame, k: Int,
      nprobe: Int = 2, asOf: Option[String] = None): DataFrame =
    probeFiltered(spark, root, queries, k, nprobe, lit(true), asOf)

  def probeFiltered(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nprobe: Int, postingsFilter: Column,
      asOf: Option[String] = None): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val m = resolveManifest(root, asOf)
    val cents = readCentroids(spark, root, m)
    val (qs, qprobe) = Similarity.queryProbe(cents, queries, nprobe,
      org.apache.spark.sql.types.LongType)
    val probed = qprobe.select(col("cid")).distinct()
      .collect().map(_.getLong(0)).toSet
    val postings = readLeaves(spark, root, m.leaves.filter(l => probed(l.cid)))
    Similarity.rankProbe(postings, qs, qprobe, k, postingsFilter)
  }

  /** Health stats of the live version — [[Similarity.ivfIndexStats]]'s
    * aggregation over the manifest-resolved postings. */
  def stats(spark: SparkSession, root: String): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val m = liveSnapshot(root)._2
    readLeaves(spark, root, m.leaves).join(broadcast(readCentroids(spark, root, m)), "cid")
      .select(col("cid"), col("batch_id"),
        round(VectorFns.dot(col("e"), col("ce")) / (col("nrm") * col("cnrm")), 6)
          .as("ccos"))
      .groupBy(col("cid"))
      .agg(
        sum(when(col("batch_id") === "base", 1L).otherwise(0L)).as("n_base"),
        sum(when(col("batch_id") =!= "base", 1L).otherwise(0L)).as("n_new"),
        sum(round(col("ccos") * 1000000, 0).cast("long")).as("sum_ccos_micro"))
  }

  /** Reclaim superseded versions' data (r12 verdict #8) — delegates to
    * [[VersionedArtifact.vacuumDataDirs]]: never the live version, never
    * a kept-grace predecessor, never an in-flight stage, and with
    * `maxAgeMs` never a version published within the age window (the
    * "readers may hold a snapshot ≤ N hours" retention contract). */
  def vacuum(root: String, keepVersions: Int = 2,
      maxAgeMs: Option[Long] = None,
      orphanGraceMs: Long = VersionedArtifact.defaultOrphanGraceMs): Seq[String] =
    VersionedArtifact.vacuumDataDirs(root, keepVersions, maxAgeMs,
      orphanGraceMs)
}
