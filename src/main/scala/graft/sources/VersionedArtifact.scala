package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Version-pointer commits for filesystem artifacts (r12 verdict #2).
  *
  * The d28/s10 artifact family publishes in place: an append is a
  * dynamic-partition overwrite and a compaction writes a copy, so a probe
  * CONCURRENT with a writer — or a crash mid-commit — can observe a
  * partially-landed batch. Retry-idempotence protects the writer; nothing
  * protects the reader. The standard public-knowledge fix (the
  * Iceberg/Delta commit shape) is snapshot isolation via an atomic
  * pointer: a writer lands a COMPLETE new version (immutable data files +
  * a manifest enumerating them), then flips one pointer file with an
  * atomic rename; a reader resolves the pointer once and reads only files
  * the manifest names, so it sees the pre-commit or post-commit snapshot,
  * never a mix. Existing data files are NEVER mutated or deleted by a
  * commit — only [[vacuumDataDirs]] reclaims them, and only for versions
  * outside the retention window.
  *
  * Layout under an artifact root:
  * {{{
  *   <root>/CURRENT              — the live version name, e.g. "v00000003"
  *   <root>/versions/<name>.mf   — that version's manifest (caller-authored lines)
  *   <root>/data/<ver>-<op>.../  — immutable data dirs, named by the version
  *                                 that created them (ties orphans to writers)
  * }}}
  *
  * `Files.move(..., ATOMIC_MOVE)` is atomic on POSIX rename semantics
  * (this deployment); on an object store the same protocol runs on a
  * conditional put / rename primitive. Manifests are plain text lines —
  * the format is the caller's (see [[graft.operators.VersionedIvf]]);
  * this object only guarantees the commit protocol.
  */
object VersionedArtifact {

  private def currentFile(root: String): Path = Paths.get(root, "CURRENT")
  private def versionsDir(root: String): Path = Paths.get(root, "versions")
  def dataDir(root: String): Path = Paths.get(root, "data")

  /** The live version name, if the artifact has ever committed. */
  def currentName(root: String): Option[String] = {
    val f = currentFile(root)
    if (Files.exists(f)) Some(Files.readString(f).trim).filter(_.nonEmpty)
    else None
  }

  /** Manifest lines of a committed version. */
  def readManifest(root: String, version: String): Seq[String] =
    Files.readAllLines(versionsDir(root).resolve(s"$version.mf"))
      .asScala.toSeq.filter(_.nonEmpty)

  /** All version names with a manifest on disk, ascending. Includes
    * versions staged past CURRENT by an in-flight (or crashed) writer. */
  def listVersions(root: String): Seq[String] = {
    val d = versionsDir(root)
    if (!Files.exists(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".mf"))
        .map(_.stripSuffix(".mf")).toSeq.sorted
      finally s.close()
    }
  }

  /** The name the NEXT commit will take: max staged-or-committed + 1.
    * A writer that crashed BEFORE staging retries under the same name —
    * its version-named data dirs overwrite cleanly instead of leaking.
    * One that crashed between stage and publish leaves an orphan
    * manifest; the retry takes the next name, and the orphan (now ≤ the
    * eventually-published CURRENT) ages out of the retention window at
    * the next [[vacuumDataDirs]]. */
  def nextName(root: String): String = {
    val cur = listVersions(root).lastOption
      .map(_.stripPrefix("v").toLong).getOrElse(0L)
    f"v${cur + 1}%08d"
  }

  /** STAGE a version: write its manifest (durably) without flipping the
    * pointer. A reader still resolves the previous version — this is the
    * crash-window state [[publish]] closes. Returns the staged name. */
  def stage(root: String, name: String, manifestLines: Seq[String]): String = {
    Files.createDirectories(versionsDir(root))
    val mf = versionsDir(root).resolve(s"$name.mf")
    val tmp = versionsDir(root).resolve(s".$name.mf.tmp")
    Files.writeString(tmp, manifestLines.mkString("", "\n", "\n"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE, StandardOpenOption.SYNC)
    Files.move(tmp, mf, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    name
  }

  /** PUBLISH a staged version: atomically flip CURRENT. After this
    * returns, every new reader resolves `name`; a reader that already
    * resolved the old pointer keeps reading the old version's immutable
    * files. Refuses to flip to a version with no staged manifest. */
  def publish(root: String, name: String): Unit = {
    require(Files.exists(versionsDir(root).resolve(s"$name.mf")),
      s"publish($name): no staged manifest under $root/versions")
    val tmp = Paths.get(root, s".CURRENT.tmp")
    Files.writeString(tmp, name + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE, StandardOpenOption.SYNC)
    Files.move(tmp, currentFile(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Retention sweep (r12 verdict #8): drop manifests and data dirs that
    * only superseded versions reference. Keeps (a) the live version, (b)
    * the `keepVersions - 1` committed versions before it (a reader that
    * resolved CURRENT just before a flip must finish its scan — the
    * grace window), and (c) anything staged PAST the live version, which
    * may be an in-flight writer. A data dir is reclaimed only when no
    * kept manifest references it AND its version tag is within the swept
    * range — vacuum can never touch a file the live version serves.
    * Returns the deleted paths (relative), for the caller's ledger. */
  def vacuumDataDirs(root: String, keepVersions: Int = 2): Seq[String] = {
    val cur = currentName(root).getOrElse(return Seq.empty)
    val all = listVersions(root)
    val committed = all.filter(_ <= cur)
    val kept = committed.takeRight(math.max(1, keepVersions)).toSet ++
      all.filter(_ > cur) // in-flight stages are not ours to reclaim
    val referenced = kept.flatMap(v => readManifest(root, v))
      .flatMap(refsOf)
    val dd = dataDir(root)
    if (!Files.exists(dd)) return Seq.empty
    val dirs = {
      val s = Files.list(dd)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }
    val doomed = dirs.filter { d =>
      val tag = d.takeWhile(_ != '-') // "<ver>-<op>" naming
      val committedTag = tag.matches("v\\d{8}") && tag <= cur
      committedTag && !kept.contains(tag) && !referenced.contains(s"data/$d")
    }
    // drop superseded manifests too, so listVersions stays bounded
    (committed.toSet -- kept).foreach { v =>
      try Files.deleteIfExists(versionsDir(root).resolve(s"$v.mf"))
      catch { case _: Exception => () }
    }
    doomed.foreach { d =>
      val p = dd.resolve(d)
      try {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(f =>
            try Files.deleteIfExists(f) catch { case _: Exception => () })
        finally walk.close()
      } catch { case _: Exception => () }
    }
    doomed.map(d => s"data/$d")
  }

  /** Top-level data dirs a manifest line references: every
    * whitespace-separated token that starts with `data/`, truncated to
    * its first path segment under data/. */
  private def refsOf(line: String): Seq[String] =
    line.split("\\s+").toSeq.filter(_.startsWith("data/"))
      .map(t => t.split("/").take(2).mkString("/"))
}
