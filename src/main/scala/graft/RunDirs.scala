package graft

/** Per-process artifact directories for queries that WRITE (d28 band
  * index, i02 quarantine sinks, i03/i05 schema-evolution landing dirs,
  * q39/q41/q54 round trips, the ingest fixture materialization).
  *
  * Round-10 ADVICE: the previous fixed `/tmp/graft_*` paths meant two
  * concurrent Verify/Bench runs on one box raced on the same artifact
  * dirs, and on a multi-user box another user could pre-own the path and
  * control the bytes both engines read (the path is interpolated into
  * oracle SQL). Namespacing by user + pid removes the same-user race
  * (each JVM owns its tree; the driver's later DuckDB process reads the
  * path the SAME Verify JVM interpolated into oracle_sql.json), and the
  * owner check turns the cross-user squat into a loud failure instead of
  * silent byte control. Dirs persist after exit by design — the oracle
  * runs in a later process — and are rewritten wholesale on the next run.
  *
  * Round-11 ADVICE: persisting-by-design must not mean accumulating
  * forever — every JVM leaves a tree behind (q39/q41/q54 write full
  * lineitem copies), so root init REAPS sibling `graft_<user>-<pid>`
  * trees whose pid is no longer alive. Our own tree is left for the
  * driver's DuckDB pass and reaped by the NEXT run once this JVM exits.
  */
object RunDirs {
  /** The current principal — loudly, never defaulted: when `user.name`
    * is absent, defaulting it to the directory's owner would make the
    * anti-squat check below vacuously true (round-11 ADVICE). */
  private lazy val me: String =
    sys.props.get("user.name").filter(_.nonEmpty).getOrElse(
      throw new IllegalStateException(
        "user.name system property unset: cannot verify artifact-dir ownership"))

  private lazy val root: java.nio.file.Path = {
    val pid = ProcessHandle.current().pid()
    val tmp = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    reapStale(tmp, pid)
    mkOwned(tmp.resolve(s"graft_$me-$pid"))
  }

  /** Best-effort deletion of sibling per-pid trees whose JVM has exited
    * (`ProcessHandle.of(pid)` empty). Only this user's trees are touched,
    * and only ones we own; every IO failure is swallowed — reaping is
    * hygiene, never a reason to fail the run. */
  private def reapStale(tmp: java.nio.file.Path, selfPid: Long): Unit = {
    import scala.jdk.CollectionConverters._
    val prefix = s"graft_$me-"
    val siblings = try {
      val s = java.nio.file.Files.list(tmp)
      try s.iterator().asScala.toList finally s.close()
    } catch { case _: Exception => Nil }
    siblings.foreach { p =>
      val name = p.getFileName.toString
      if (name.startsWith(prefix)) {
        val pidStr = name.drop(prefix.length)
        val dead = pidStr.forall(_.isDigit) && pidStr.nonEmpty &&
          pidStr.toLong != selfPid &&
          !ProcessHandle.of(pidStr.toLong).isPresent
        val mine = try {
          java.nio.file.Files.getOwner(p).getName == me
        } catch { case _: Exception => false }
        if (dead && mine) {
          try {
            val walk = java.nio.file.Files.walk(p)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .iterator().asScala.foreach { f =>
                try java.nio.file.Files.deleteIfExists(f)
                catch { case _: Exception => () }
              }
            finally walk.close()
          } catch { case _: Exception => () }
        }
      }
    }
  }

  /** Create (or accept an existing) directory, then REQUIRE it is owned
    * by the current user — a pre-owned path fails loudly. Permissions are
    * restricted to the owner where the filesystem supports POSIX perms. */
  private def mkOwned(p: java.nio.file.Path): java.nio.file.Path = {
    java.nio.file.Files.createDirectories(p)
    try {
      val perms = java.nio.file.attribute.PosixFilePermissions
        .fromString("rwx------")
      java.nio.file.Files.setPosixFilePermissions(p, perms)
    } catch { case _: UnsupportedOperationException => () }
    val owner = java.nio.file.Files.getOwner(p).getName
    require(owner == me,
      s"refusing artifact dir $p: owned by '$owner', not '$me'")
    p
  }

  /** A named artifact dir under this process's root, created on demand. */
  def dir(name: String): java.nio.file.Path =
    mkOwned(root.resolve(name))

  /** [[dir]], WIPED clean first — for registered queries over VERSIONED
    * artifacts. A versioned build is deliberately NOT a reset (a rebuild
    * carries committed batch ids forward so replayed appends stay no-ops
    * — the exactly-once contract), so re-executing such a query against
    * the previous execution's root would silently no-op its own appends;
    * Bench executes every registered query four times in one JVM. These
    * queries therefore start from an empty root on every execution. */
  def freshDir(name: String): java.nio.file.Path = {
    import scala.jdk.CollectionConverters._
    val p = dir(name)
    val walk = java.nio.file.Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.filter(_ != p).foreach { f =>
        try java.nio.file.Files.deleteIfExists(f)
        catch { case _: Exception => () }
      }
    finally walk.close()
    p
  }
}
