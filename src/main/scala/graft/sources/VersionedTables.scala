package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Version-pointer commits for a set of NAMED TABLES — the generic form
  * of [[graft.operators.VersionedIvf]]/[[graft.operators.VersionedBand]]
  * for artifacts whose snapshot is "these parquet tables, atomically
  * together" rather than an incrementally-maintained leaf set: the
  * trained tokenizer (merge table + vocabulary — r14 verdict #4: a
  * retrain racing running encoders is exactly the lost-update/torn-read
  * shape the commit protocol exists for, and "encode with tokenizer v1
  * while v2 trains" is the production norm) and maintained graph state
  * (degree stats / component labels — r14 verdict #8). Every publish
  * lands a COMPLETE new copy of each table plus a manifest naming them,
  * then CAS-flips CURRENT through [[VersionedArtifact]]: a reader
  * resolves the pointer once and sees one committed snapshot — never
  * table A from v1 beside table B from v2 — and a pinned (`asOf`)
  * reader keeps its snapshot while publishes land past it, protected by
  * vacuum's retention windows.
  *
  * Manifest lines: `table <name> <relpath>`. Tables are rewritten whole
  * per publish BY DESIGN — these artifacts are vocabulary-/node-stat-
  * sized (orders of magnitude below the corpus), so snapshot clarity is
  * worth the full copy; corpus-scale artifacts use the leaf-referencing
  * indexes instead. */
object VersionedTables {

  private def render(tables: Seq[(String, String)]): Seq[String] =
    tables.map { case (n, p) => s"table $n $p" }

  private def parse(lines: Seq[String]): Map[String, String] =
    lines.map { ln =>
      ln.split("\\s+").toSeq match {
        case Seq("table", n, p) => n -> p
        case _ => throw new IllegalArgumentException(s"bad manifest line: $ln")
      }
    }.toMap

  private def segToken(): String = VersionedArtifact.segToken()

  /** The live version, if the artifact has ever committed — capture it
    * BEFORE deriving a successor state and pass it to [[publish]] as
    * `base`, so a concurrent publisher surfaces a retryable
    * [[CommitConflictException]] instead of a lost update. */
  def liveVersion(root: String): Option[String] =
    VersionedArtifact.currentName(root)

  /** PUBLISH one snapshot: write every table as an immutable data dir
    * under the next version, stage the manifest recording `base` (the
    * version the caller derived this state from; None = publishing into
    * a fresh artifact), and CAS-flip the pointer. Tables are written
    * BEFORE the stage, so a crash leaves the prior version serving and
    * version-tagged orphans for vacuum. Returns the committed version;
    * throws [[CommitConflictException]] if another writer committed
    * first — re-derive from the new live snapshot and retry. */
  def publish(root: String, tables: Seq[(String, DataFrame)],
      base: Option[String]): String = {
    val ver = VersionedArtifact.nextName(root)
    val w = segToken()
    val entries = tables.map { case (name, df) =>
      require(name.matches("[A-Za-z0-9_.-]+"), s"bad table name: $name")
      val rel = s"data/$ver-$name-$w"
      df.write.mode("overwrite").parquet(s"$root/$rel")
      name -> rel
    }
    VersionedArtifact.stage(root, ver, render(entries), base)
    VersionedArtifact.publish(root, ver)
    ver
  }

  /** Read one table of the live snapshot — or, with `asOf`, of a pinned
    * PUBLISHED version still inside vacuum's retention window (a stale
    * pin fails loudly; see [[VersionedArtifact.resolveManifestLines]]).
    * Declared-schema read: an empty table round-trips instead of
    * failing inference. */
  def read(spark: SparkSession, root: String, name: String,
      schema: StructType, asOf: Option[String] = None): DataFrame = {
    val tables = parse(VersionedArtifact.resolveManifestLines(root, asOf))
    val rel = tables.getOrElse(name, throw new IllegalArgumentException(
      s"table '$name' not in snapshot under $root (has: ${tables.keys.toSeq.sorted.mkString(", ")})"))
    spark.read.schema(schema).parquet(s"$root/$rel")
  }

  /** Reclaim superseded versions — count floor plus optional age window,
    * both delegated to [[VersionedArtifact.vacuumDataDirs]]. */
  def vacuum(root: String, keepVersions: Int = 2,
      maxAgeMs: Option[Long] = None,
      orphanGraceMs: Long = VersionedArtifact.defaultOrphanGraceMs): Seq[String] =
    VersionedArtifact.vacuumDataDirs(root, keepVersions, maxAgeMs,
      orphanGraceMs)
}
