package graft

/** Child JVM for ArtifactLifecycleSpec's cross-process writer arm: one
  * [[graft.operators.VersionedBand.append]] against the given artifact
  * root from its OWN process, so the commit lock (an OS file lock) and
  * the CAS publish are exercised across a real process boundary — the
  * in-JVM concurrency tests serialize on the per-root JVM monitor before
  * the file lock is ever contended, which leaves flock semantics
  * otherwise untested. Exits nonzero on any failure; the parent asserts
  * on the exit code and on the merged manifest. */
object CrossProcessAppendMain {
  def main(args: Array[String]): Unit = {
    val Array(root, batchId, sfDir, lo, hi) = args
    val spark = GraftSession.get(master = "local[2]", shufflePartitions = 2,
      appName = "graft-xproc-append")
    try {
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(spark, sfDir, "documents")
        .filter(col("doc_id") >= lo.toLong && col("doc_id") < hi.toLong)
      operators.VersionedBand.append(spark, docs, root, batchId)
    } finally spark.stop()
  }
}
