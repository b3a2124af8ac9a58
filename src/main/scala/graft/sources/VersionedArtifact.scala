package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** A commit lost the optimistic-concurrency race: CURRENT moved past the
  * manifest's base version, another writer already staged the same
  * version name, or the commit lock could not be acquired. RETRYABLE —
  * the caller re-reads the live snapshot, re-derives its manifest from
  * it, and commits again ([[graft.operators.VersionedIvf.append]] does
  * exactly that). */
final class CommitConflictException(msg: String)
  extends RuntimeException(msg)

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
  * CONCURRENT WRITERS (r13 verdict #1) are safe by optimistic
  * concurrency, exactly the Iceberg/Delta commit rule:
  *   - every staged manifest records its BASE — the version the writer
  *     derived it from (`#base` protocol line, invisible to callers);
  *   - [[stage]] claims its version name with an O_EXCL-strength
  *     primitive (`Files.createLink` — link(2) never replaces), so two
  *     writers that race to the same name produce one winner and one
  *     [[CommitConflictException]], never a silent overwrite;
  *   - [[publish]] takes a commit lock, re-reads CURRENT, and flips ONLY
  *     if it still equals the staged base — a writer whose base was
  *     superseded (its manifest would silently drop the other writer's
  *     committed leaves: the classic lost update) gets a retryable
  *     conflict and its orphan manifest removed.
  * Exactly one writer wins each version; a loser retries from the new
  * live snapshot. Published versions are recorded in an append-only
  * `versions/PUBLISHED` log (written under the commit lock), so
  * [[vacuumDataDirs]] can tell a committed version from a
  * staged-but-never-published crash orphan (r13 ADVICE: an orphan must
  * not consume a retention-grace slot).
  *
  * Layout under an artifact root:
  * {{{
  *   <root>/CURRENT              — the live version name, e.g. "v00000003"
  *   <root>/.commit.lock         — transient publish lock (holder pid inside)
  *   <root>/versions/<name>.mf   — that version's manifest (caller-authored
  *                                 lines after the #base protocol line)
  *   <root>/versions/PUBLISHED   — append-only log of published versions
  *   <root>/data/<ver>-<op>.../  — immutable data dirs, tagged with the
  *                                 version current when the writer started
  *                                 (ties orphans to writers for vacuum)
  * }}}
  *
  * `Files.move(..., ATOMIC_MOVE)` is atomic on POSIX rename semantics and
  * `Files.createLink` is atomic-exclusive on link(2) (this deployment);
  * on an object store the same protocol runs on a conditional-put /
  * if-none-match primitive. Manifests are plain text lines — the format
  * is the caller's (see [[graft.operators.VersionedIvf]]); this object
  * only guarantees the commit protocol.
  */
object VersionedArtifact {

  private def currentFile(root: String): Path = Paths.get(root, "CURRENT")
  private def versionsDir(root: String): Path = Paths.get(root, "versions")
  private def publishedLog(root: String): Path =
    versionsDir(root).resolve("PUBLISHED")
  def dataDir(root: String): Path = Paths.get(root, "data")

  private val tmpSeq = new java.util.concurrent.atomic.AtomicLong()

  /** The live version name, if the artifact has ever committed. */
  def currentName(root: String): Option[String] = {
    val f = currentFile(root)
    if (Files.exists(f)) Some(Files.readString(f).trim).filter(_.nonEmpty)
    else None
  }

  /** Manifest lines of a committed version — protocol lines (`#…`) are
    * this object's, never surfaced to the caller's parser. */
  def readManifest(root: String, version: String): Seq[String] =
    Files.readAllLines(versionsDir(root).resolve(s"$version.mf"))
      .asScala.toSeq.filter(l => l.nonEmpty && !l.startsWith("#"))

  /** The staged base version recorded by [[stage]] — the version the
    * writer derived its manifest from; None = staged against an
    * uncommitted (fresh) artifact. */
  def baseOf(root: String, version: String): Option[String] = {
    val mf = versionsDir(root).resolve(s"$version.mf")
    if (!Files.exists(mf)) return None
    Files.readAllLines(mf).asScala
      .find(_.startsWith("#base "))
      .map(_.stripPrefix("#base ").trim)
      .filter(_ != "-")
  }

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

  /** Versions that were actually PUBLISHED (pointer flipped to them), in
    * ascending order, restricted to ones whose manifest still exists and
    * that are at-or-before CURRENT (an entry logged by a writer that
    * crashed between the log append and the pointer flip is not yet
    * published). CURRENT itself is always included — it is published by
    * definition, even if a pre-log-format writer flipped it. */
  def publishedVersions(root: String): Seq[String] =
    currentName(root) match {
      case None => Seq.empty
      case Some(cur) =>
        val have = listVersions(root).toSet
        val logged =
          if (!Files.exists(publishedLog(root))) Seq.empty
          else Files.readAllLines(publishedLog(root)).asScala.toSeq
            .map(_.trim).filter(_.nonEmpty)
        (logged.filter(v => have.contains(v) && v <= cur) :+ cur)
          .distinct.sorted
    }

  /** The name the NEXT commit will take: max staged-or-committed + 1.
    * Read-then-act by design — two writers can compute the same name, and
    * [[stage]]'s exclusive claim turns that race into one winner plus one
    * retryable [[CommitConflictException]]. */
  def nextName(root: String): String = {
    val cur = listVersions(root).lastOption
      .map(_.stripPrefix("v").toLong).getOrElse(0L)
    f"v${cur + 1}%08d"
  }

  /** STAGE a version: durably write its manifest — recording `base`, the
    * version the writer derived it from — WITHOUT flipping the pointer.
    * A reader still resolves the previous version; this is the
    * crash-window state [[publish]] closes. The manifest name is claimed
    * exclusively (link(2) fails on an existing target, atomically), so a
    * second writer staging the same name gets a
    * [[CommitConflictException]] instead of silently overwriting the
    * first writer's staged commit. Returns the staged name. */
  def stage(root: String, name: String, manifestLines: Seq[String],
      base: Option[String]): String = {
    Files.createDirectories(versionsDir(root))
    val mf = versionsDir(root).resolve(s"$name.mf")
    val tmp = versionsDir(root).resolve(
      s".$name.mf.tmp-${ProcessHandle.current().pid()}-${tmpSeq.incrementAndGet()}")
    val lines = s"#base ${base.getOrElse("-")}" +: manifestLines
    Files.writeString(tmp, lines.mkString("", "\n", "\n"),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE,
      StandardOpenOption.SYNC)
    try {
      Files.createLink(mf, tmp) // atomic O_EXCL claim of the version name
      name
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(
          s"stage($name): another writer already staged this version under $root")
    } finally {
      Files.deleteIfExists(tmp)
    }
  }

  /** PUBLISH a staged version: under the commit lock, re-read CURRENT and
    * atomically flip it to `name` ONLY if it still equals the base the
    * manifest was staged against — the compare-and-swap that makes a
    * racing writer's lost update impossible. On a lost race the staged
    * manifest is removed (its data dirs age out via [[vacuumDataDirs]])
    * and a retryable [[CommitConflictException]] is thrown. After this
    * returns, every new reader resolves `name`; a reader that already
    * resolved the old pointer keeps reading the old version's immutable
    * files. Refuses to flip to a version with no staged manifest. */
  def publish(root: String, name: String): Unit = {
    val mf = versionsDir(root).resolve(s"$name.mf")
    require(Files.exists(mf),
      s"publish($name): no staged manifest under $root/versions")
    val base = baseOf(root, name)
    withCommitLock(root) {
      val cur = currentName(root)
      if (cur != base) {
        // lost the race: the live version moved past our base, so this
        // manifest was derived from a superseded snapshot and committing
        // it would drop the interleaved writer's leaves
        try Files.deleteIfExists(mf) catch { case _: Exception => () }
        throw new CommitConflictException(
          s"publish($name): CURRENT is ${cur.getOrElse("<none>")}, " +
            s"staged base was ${base.getOrElse("<none>")} — re-derive and retry")
      }
      // log-then-flip: a crash between the two leaves a log entry whose
      // version is > CURRENT, which publishedVersions ignores
      Files.write(publishedLog(root), (name + "\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE,
        StandardOpenOption.APPEND, StandardOpenOption.SYNC)
      val tmp = Paths.get(root, s".CURRENT.tmp")
      Files.writeString(tmp, name + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
        StandardOpenOption.WRITE, StandardOpenOption.SYNC)
      Files.move(tmp, currentFile(root), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** The publish-side mutual exclusion: an O_EXCL lock file carrying the
    * holder's pid. Held only across the CAS check + pointer flip
    * (microseconds); a holder that died is detected by its pid and the
    * stale lock is broken with an atomic rename, so exactly one waiter
    * takes over. On an object store this whole primitive is one
    * conditional put of CURRENT. */
  private def withCommitLock[T](root: String)(f: => T): T = {
    val lock = Paths.get(root, ".commit.lock")
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var held = false
    while (!held) {
      try {
        Files.writeString(lock, ProcessHandle.current().pid().toString + "\n",
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE,
          StandardOpenOption.SYNC)
        held = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val stalePid = try {
            val pid = Files.readString(lock).trim
            if (pid.nonEmpty && pid.forall(_.isDigit) &&
                !ProcessHandle.of(pid.toLong).isPresent) Some(pid) else None
          } catch { case _: Exception => None }
          if (stalePid.isDefined) {
            // atomic takeover: only one waiter wins the rename
            val claim = Paths.get(root,
              s".commit.lock.stale-${ProcessHandle.current().pid()}-${tmpSeq.incrementAndGet()}")
            try {
              Files.move(lock, claim, StandardCopyOption.ATOMIC_MOVE)
              Files.deleteIfExists(claim)
            } catch { case _: Exception => () }
          } else if (System.nanoTime() > deadline) {
            throw new CommitConflictException(
              s"publish: commit lock $lock held past timeout")
          } else Thread.sleep(10)
      }
    }
    try f finally Files.deleteIfExists(lock)
  }

  /** Retention sweep (r12 verdict #8): drop manifests and data dirs that
    * only superseded versions reference. Keeps (a) the live version, (b)
    * the `keepVersions - 1` PUBLISHED versions before it (a reader that
    * resolved CURRENT just before a flip must finish its scan — the
    * grace window; a staged-but-never-published crash orphan cannot
    * consume a slot, r13 ADVICE), and (c) anything staged PAST the live
    * version, which may be an in-flight writer. A data dir is reclaimed
    * only when no kept manifest references it AND its version tag is
    * within the swept range — vacuum can never touch a file the live
    * version serves. Returns the deleted paths (relative), for the
    * caller's ledger. */
  def vacuumDataDirs(root: String, keepVersions: Int = 2): Seq[String] = {
    val cur = currentName(root).getOrElse(return Seq.empty)
    val all = listVersions(root)
    val committed = all.filter(_ <= cur)
    // the grace window counts PUBLISHED versions only — a crash orphan
    // (staged ≤ CURRENT, never flipped to) is swept like any superseded
    // version instead of displacing a version a live reader may hold
    val published = publishedVersions(root)
    val graceBase = if (published.nonEmpty) published else committed
    val kept = graceBase.takeRight(math.max(1, keepVersions)).toSet +
      cur ++ all.filter(_ > cur) // in-flight stages are not ours to reclaim
    val referenced = kept.filter(all.contains(_))
      .flatMap(v => readManifest(root, v))
      .flatMap(refsOf)
    val dd = dataDir(root)
    if (!Files.exists(dd)) return Seq.empty
    val dirs = {
      val s = Files.list(dd)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }
    val doomed = dirs.filter { d =>
      val tag = d.takeWhile(_ != '-') // "<ver>-<op>..." naming
      val committedTag = tag.matches("v\\d{8}") && tag <= cur
      committedTag && !kept.contains(tag) && !referenced.contains(s"data/$d")
    }
    // drop superseded manifests too (crash orphans included), so
    // listVersions stays bounded
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
