package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Scan/sink layer: CSV / JSON / Parquet / ORC with the engine's defaults.
  *
  * Reads default to FAILFAST with an explicit schema — the reference's
  * fail-on-malformed semantics (`Long.parseLong` throwing on bad lines,
  * SURVEY.md §1.4) generalized: schema-on-read is never inferred in
  * production paths (inference = an extra full scan at 100 TB).
  *
  * Writes go through [[writeParquet]] with optional hash partitioning by
  * key columns — the layout that lets downstream scans partition-prune.
  */
object Formats {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ",", header: Boolean = false,
      permissive: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", delimiter)
      .option("header", header.toString)
      .option("mode", if (permissive) "PERMISSIVE" else "FAILFAST")
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  def writeCsv(df: DataFrame, path: String, delimiter: String = ",",
      header: Boolean = false): Unit =
    df.write.mode("overwrite")
      .option("sep", delimiter).option("header", header.toString)
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Parquet sink; `partitionBy` produces a directory per key value so
    * later reads with a key predicate scan only matching directories. */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w: DataFrameWriter[Row] = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** ORC round-trip — same columnar pushdown/pruning properties as
    * parquet (predicate pushdown, column projection, partition dirs);
    * offered because warehouse interop often dictates the format, and the
    * engine's plans are format-agnostic above the scan. */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w: DataFrameWriter[Row] = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Small-file compaction — the lake-maintenance pass that keeps a
    * landing directory scannable. Streaming sinks and incremental batch
    * appends leave thousands of KB-scale files; at 100 TB the scan cost
    * is then dominated by task scheduling and footer reads, not data.
    * Rewrites `inDir` into ⌈bytes / targetBytes⌉ files at `outDir` and
    * returns the file count. Row-identical by construction (one
    * round-robin repartition, no keys touched); sized from the REAL
    * on-disk bytes, not an estimate. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20): Int = {
    // outDir inside inDir would write the compacted copy UNDER the landing
    // dir, so the next recursive scan double-counts every row (r7 ADVICE)
    val inAbs = new java.io.File(inDir).getCanonicalPath + java.io.File.separator
    val outAbs = new java.io.File(outDir).getCanonicalPath + java.io.File.separator
    require(!outAbs.startsWith(inAbs),
      s"compactParquet: outDir ($outDir) must not be inDir or nested inside it ($inDir)")
    val df = spark.read.parquet(inDir)
    // stat each file on ITS OWN filesystem — FileSystem.get(conf) is the
    // default FS only, and a lake landing dir is exactly where the path
    // scheme (s3a/hdfs/file) differs from fs.defaultFS
    val conf = spark.sparkContext.hadoopConfiguration
    val bytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    df.repartition(nFiles).write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Bucketed managed table: pre-shuffles rows into `buckets` files by
    * `bucketCols`, so equi-joins/aggregations between co-bucketed tables
    * need NO exchange — the 100 TB answer to repeated joins on the same
    * key. Requires a session with a writable warehouse dir. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Bucketed write at an explicit path (external table): same bucket
    * metadata in the catalog, but the files land under `path` instead of
    * the session warehouse — what a registered query uses so repeated
    * runs overwrite one tmp location. */
  def writeBucketedAt(df: DataFrame, path: String, table: String,
      bucketCols: Seq[String], buckets: Int): Unit = {
    // overwrite of an external table keeps stale files if the table is
    // dropped first by a failed run — drop THEN write is idempotent
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite").option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
