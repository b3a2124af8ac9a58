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
  */
object RunDirs {
  private lazy val root: java.nio.file.Path = {
    val user = sys.props.getOrElse("user.name", "user")
    val pid = ProcessHandle.current().pid()
    val base = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_$user-$pid")
    mkOwned(base)
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
    val me = sys.props.getOrElse("user.name", owner)
    require(owner == me,
      s"refusing artifact dir $p: owned by '$owner', not '$me'")
    p
  }

  /** A named artifact dir under this process's root, created on demand. */
  def dir(name: String): java.nio.file.Path =
    mkOwned(root.resolve(name))
}
