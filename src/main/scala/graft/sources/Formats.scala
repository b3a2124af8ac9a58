package graft.sources

import graft.Q
import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType, TimestampType}

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

  /** Tolerant ingest with corrupt-record QUARANTINE — the third arm
    * between FAILFAST (the reference's semantics — one malformed line in
    * hour 1 of a 100 TB ingest kills the job) and plain PERMISSIVE
    * (malformed fields silently null — data loss with no audit trail).
    * Every input line comes back: parseable rows with their typed
    * columns, malformed rows with the RAW LINE in `corruptCol` (null for
    * good rows), so one scan routes good rows onward and quarantined
    * rows to a badRecords output with counts — nothing dropped, nothing
    * fatal. Malformed = wrong field count OR any field failing its cast
    * (Spark's univocity semantics; i01's oracle re-derives the same
    * classification from the raw lines in DuckDB).
    *
    * Caveat (Spark rule): a query referencing ONLY `corruptCol` over a
    * raw CSV is disallowed by the analyzer — route/filter alongside at
    * least one data column, or materialize first (a production ingest
    * does anyway: one scan, two sinks). */
  def readCsvQuarantine(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ",", header: Boolean = false,
      corruptCol: String = "_corrupt"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("sep", delimiter)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)

  /** JSON sibling of [[readCsvQuarantine]]: malformed JSON lines (parse
    * failures, type mismatches against the schema) come back with the raw
    * line in `corruptCol`, null for good rows — same routing contract,
    * same analyzer caveat. */
  def readJsonQuarantine(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

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
      targetBytes: Long = 128L << 20,
      schema: Option[StructType] = None): Int = {
    // outDir inside inDir would write the compacted copy UNDER the landing
    // dir, so the next recursive scan double-counts every row (r7 ADVICE)
    val inAbs = new java.io.File(inDir).getCanonicalPath + java.io.File.separator
    val outAbs = new java.io.File(outDir).getCanonicalPath + java.io.File.separator
    require(!outAbs.startsWith(inAbs),
      s"compactParquet: outDir ($outDir) must not be inDir or nested inside it ($inDir)")
    // an explicit schema lets an EMPTY landing dir compact to an empty
    // (but schema-bearing) output instead of failing inference — a
    // partitioned write of zero rows leaves no footers to infer from
    val reader = schema.fold(spark.read)(sc => spark.read.schema(sc))
    val df = reader.parquet(inDir)
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
    // Hash-distribute on the bucket key BEFORE the bucketed write (the
    // Iceberg write.distribution-mode=hash shape, guide §6): repartition
    // to `buckets` partitions uses the same murmur3+pmod as the bucket
    // spec, so every task holds exactly one bucket — one file per bucket
    // REGARDLESS of input task count (without it, every input task
    // writes a file into every bucket: tasks × buckets small files at
    // scale, and on a one-task local scan the whole sort+write ran on a
    // single core).
    df.repartition(buckets, bucketCols.map(col): _*)
      .write.mode("overwrite").option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Planted fixture for i01: 11 CSV lines over an events-like schema,
    * 5 well-formed and 6 malformed — one per corruption class (non-numeric
    * BIGINT, too few fields, no delimiter at all, too many fields,
    * non-numeric DOUBLE, invalid TIMESTAMP). Loaded from the CLASSPATH
    * (src/main/resources — survives packaging and any checkout path) and
    * materialized to a stable tmp location that outlives this JVM, because
    * the driver's DuckDB oracle runs in a LATER process against the same
    * path the generated SQL interpolated. Both engines read identical
    * bytes. */
  private[graft] lazy val ingestFixturePath: String = {
    val in = getClass.getResourceAsStream("/fixtures/ingest_corrupt.csv")
    require(in != null, "fixtures/ingest_corrupt.csv missing from classpath")
    val dir = graft.RunDirs.dir("fixtures")
    val p = dir.resolve("ingest_corrupt.csv")
    try java.nio.file.Files.copy(in, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    p.toString
  }

  /** Quarantine-rate metrics over a tolerant read ([[readCsvQuarantine]]
    * output): one row of (n_input, n_quarantined, bad_ppm, tripped) per
    * threshold. The operational third rail between FAILFAST and
    * PERMISSIVE: a tolerant ingest that quietly quarantines 99% of a feed
    * is an OUTAGE wearing a green job status — when an upstream format
    * breaks, the batch must fail loudly, while background noise (a few
    * bad lines per million) flows on. Exact integer ppm, one aggregate
    * over the already-materialized parse — no second scan. */
  def quarantineRateMetrics(parsed: DataFrame, maxBadPpm: Long,
      corruptCol: String = "_corrupt"): DataFrame =
    parsed.agg(
        count(lit(1)).cast("long").as("n_input"),
        sum(when(col(corruptCol).isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_quarantined"))
      .select(col("n_input"), col("n_quarantined"),
        expr("1000000 * n_quarantined div greatest(n_input, CAST(1 AS BIGINT))")
          .as("bad_ppm"),
        lit(maxBadPpm).as("max_bad_ppm"))
      .withColumn("tripped",
        (col("bad_ppm") > col("max_bad_ppm")).cast("int"))

  /** FAILFAST-by-policy: throw when the quarantine rate exceeds
    * `maxBadPpm` — the circuit breaker a scheduled 100 TB ingest wires
    * between the tolerant read and the commit of its outputs. */
  def requireQuarantineRate(parsed: DataFrame, maxBadPpm: Long,
      corruptCol: String = "_corrupt"): Unit = {
    val r = quarantineRateMetrics(parsed, maxBadPpm, corruptCol).head()
    if (r.getAs[Int]("tripped") == 1)
      throw new IllegalStateException(
        s"ingest circuit breaker: ${r.getAs[Long]("n_quarantined")} of " +
          s"${r.getAs[Long]("n_input")} rows quarantined " +
          s"(${r.getAs[Long]("bad_ppm")} ppm > $maxBadPpm ppm)")
  }

  /** Tolerant per-LINE parse — the column form of [[readCsvQuarantine]]
    * that a STREAMING ingest needs (a readStream of raw lines, parsed in
    * the query, so the same micro-batch carries both disposition and the
    * raw line for routing). Same parser, same PERMISSIVE + corrupt-column
    * contract as the file-path form. */
  def parseCsvTolerant(lines: DataFrame, schema: StructType,
      corruptCol: String = "_corrupt"): DataFrame =
    lines.select(col("line"), from_csv(col("line"),
        schema.add(corruptCol, StringType),
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corruptCol))
      .getField(corruptCol).as(corruptCol))

  /** Per-chunk quarantine-rate metrics (st15's batch form): the fixture's
    * lines partitioned into replay chunks by a pure function of the line
    * (length mod `chunks` — any deterministic key works; micro-batch
    * membership is arrival detail, not content), each chunk scored with
    * [[quarantineRateMetrics]]'s exact-ppm rule. In the streaming form
    * each chunk IS one micro-batch and `tripped` is the i04 breaker's
    * stop condition — StreamingSpec proves stream==batch on this exact
    * chunking and that the breaker kills the query on the poisoned
    * chunk. */
  def ingestChunkMetrics(lines: DataFrame, schema: StructType,
      maxBadPpm: Long, chunks: Int = 3): DataFrame =
    parseCsvTolerant(lines, schema)
      .groupBy(pmod(length(col("line")), lit(chunks)).cast("int")
        .as("chunk_id"))
      .agg(count(lit(1)).cast("long").as("n_input"),
        sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_quarantined"))
      .select(col("chunk_id"), col("n_input"), col("n_quarantined"),
        expr("1000000 * n_quarantined div greatest(n_input, CAST(1 AS BIGINT))")
          .as("bad_ppm"),
        lit(maxBadPpm).as("max_bad_ppm"))
      .withColumn("tripped",
        (col("bad_ppm") > col("max_bad_ppm")).cast("int"))

  val queries: Seq[Q] = Seq(
    // ---- i01: tolerant ingest — corrupt lines QUARANTINED, not dropped,
    // not fatal. Per-line disposition: good rows carry their parsed typed
    // columns; quarantined rows carry the raw line (parsed columns
    // nulled on BOTH sides — Spark's partial field fill is parser
    // detail, not contract). The oracle reclassifies the same raw lines
    // in DuckDB (field count + per-field try_cast), so green certifies
    // quarantined ≠ dropped ≠ job-failed AND the classification itself.
    Q("i01_tolerant_ingest", { (s, _) =>
        val schema = new StructType()
          .add("event_id", LongType).add("ts", TimestampType)
          .add("user_id", LongType).add("event_type", StringType)
          .add("value", DoubleType)
        val df = readCsvQuarantine(s, ingestFixturePath, schema)
        val good = col("_corrupt").isNull
        df.select(
            when(good, lit("good")).otherwise(lit("quarantined")).as("status"),
            when(good, col("event_id")).as("event_id"),
            when(good, date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("ts_s"),
            when(good, col("user_id")).as("user_id"),
            when(good, col("event_type")).as("event_type"),
            when(good, col("value")).as("value"),
            col("_corrupt").as("raw"))
          .orderBy(col("status"), coalesce(col("event_id"), lit(-1L)),
            coalesce(col("raw"), lit("")))
      },
      Some(s"""WITH raw AS (SELECT line FROM read_csv('$ingestFixturePath',
              |        columns={'line': 'VARCHAR'}, delim='|', quote='',
              |        header=false)),
              |p AS (SELECT line, str_split(line, ',') AS f FROM raw),
              |c AS (SELECT line, f,
              |  (len(f) = 5
              |   AND try_cast(f[1] AS BIGINT) IS NOT NULL
              |   AND try_cast(f[2] AS TIMESTAMP) IS NOT NULL
              |   AND try_cast(f[3] AS BIGINT) IS NOT NULL
              |   AND try_cast(f[5] AS DOUBLE) IS NOT NULL) AS ok FROM p)
              |SELECT CASE WHEN ok THEN 'good' ELSE 'quarantined' END AS status,
              |  CASE WHEN ok THEN try_cast(f[1] AS BIGINT) END AS event_id,
              |  CASE WHEN ok THEN strftime(try_cast(f[2] AS TIMESTAMP),
              |       '%Y-%m-%d %H:%M:%S') END AS ts_s,
              |  CASE WHEN ok THEN try_cast(f[3] AS BIGINT) END AS user_id,
              |  CASE WHEN ok THEN f[4] END AS event_type,
              |  CASE WHEN ok THEN try_cast(f[5] AS DOUBLE) END AS value,
              |  CASE WHEN NOT ok THEN line END AS raw
              |FROM c
              |ORDER BY status, coalesce(event_id, -1), coalesce(raw, '')""".stripMargin)),

    // ---- i04: ingest circuit breaker — the quarantine-RATE gate ---------
    // Two thresholds over the planted fixture (6 bad of 11 = 545,454
    // ppm): the 300,000-ppm row must trip and the 600,000-ppm row must
    // not, so one hash certifies BOTH breaker decisions plus the exact
    // rate arithmetic. requireQuarantineRate (the throwing form a
    // scheduled ingest wires before committing outputs) is spec-tested
    // on the same fixture.
    Q("i04_ingest_circuit_breaker", { (s, _) =>
        val schema = new StructType()
          .add("event_id", LongType).add("ts", TimestampType)
          .add("user_id", LongType).add("event_type", StringType)
          .add("value", DoubleType)
        val parsed = readCsvQuarantine(s, ingestFixturePath, schema)
          .localCheckpoint()
        quarantineRateMetrics(parsed, 300000L)
          .unionByName(quarantineRateMetrics(parsed, 600000L))
          .orderBy(col("max_bad_ppm"))
      },
      Some(s"""WITH raw AS (SELECT line FROM read_csv('$ingestFixturePath',
              |        columns={'line': 'VARCHAR'}, delim='|', quote='',
              |        header=false)),
              |p AS (SELECT line, str_split(line, ',') AS f FROM raw),
              |c AS (SELECT line, f,
              |  (len(f) = 5
              |   AND try_cast(f[1] AS BIGINT) IS NOT NULL
              |   AND try_cast(f[2] AS TIMESTAMP) IS NOT NULL
              |   AND try_cast(f[3] AS BIGINT) IS NOT NULL
              |   AND try_cast(f[5] AS DOUBLE) IS NOT NULL) AS ok FROM p),
              |m AS (SELECT CAST(count(*) AS BIGINT) AS n_input,
              |      CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
              |        AS n_quarantined FROM c)
              |SELECT n_input, n_quarantined,
              |  CAST(1000000 * n_quarantined // greatest(n_input, 1) AS BIGINT)
              |    AS bad_ppm,
              |  t.max_bad_ppm,
              |  CAST(1000000 * n_quarantined // greatest(n_input, 1)
              |       > t.max_bad_ppm AS INT) AS tripped
              |FROM m, (VALUES (CAST(300000 AS BIGINT)),
              |                (CAST(600000 AS BIGINT))) t(max_bad_ppm)
              |ORDER BY max_bad_ppm""".stripMargin)),

    // ---- i02: quarantine SINK composition — the production shape i01
    // classifies for: ONE materialized scan routed to TWO sinks (good
    // rows typed parquet, quarantined rows raw+reason parquet), then the
    // result read back FROM THE SINKS with counts reconciled in-query
    // (q39's write-inside-the-gate pattern). Green certifies
    // good + quarantined == input on the planted fixture AND the reason
    // attribution, re-derived independently by the oracle's identical
    // first-failing-field case chain.
    Q("i02_quarantine_sink", { (s, _) =>
        val schema = new StructType()
          .add("event_id", LongType).add("ts", TimestampType)
          .add("user_id", LongType).add("event_type", StringType)
          .add("value", DoubleType)
        // localCheckpoint = the one-scan barrier (parser runs once for
        // both sinks) and lifts Spark's corrupt-column-only restriction
        val parsed = readCsvQuarantine(s, ingestFixturePath, schema)
          .localCheckpoint()
        val base = graft.RunDirs.dir("i02")
        val goodDir = base.resolve("good").toString
        val quarDir = base.resolve("quarantine").toString
        val good = parsed.filter(col("_corrupt").isNull)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
        // reason = first failing field, same order as the oracle's chain
        val f = split(col("raw"), ",", -1)
        val quar = parsed.filter(col("_corrupt").isNotNull)
          .select(col("_corrupt").as("raw"))
          .withColumn("reason",
            when(size(f) =!= 5,
              concat(lit("field_count:"), size(f).cast("string")))
            .when(expr("try_cast(element_at(split(raw, ',', -1), 1) AS BIGINT)").isNull,
              lit("bad_event_id"))
            .when(expr("try_cast(element_at(split(raw, ',', -1), 2) AS TIMESTAMP)").isNull,
              lit("bad_ts"))
            .when(expr("try_cast(element_at(split(raw, ',', -1), 3) AS BIGINT)").isNull,
              lit("bad_user_id"))
            .when(expr("try_cast(element_at(split(raw, ',', -1), 5) AS DOUBLE)").isNull,
              lit("bad_value"))
            .otherwise(lit("unknown")))
        writeParquet(good, goodDir)
        writeParquet(quar, quarDir)
        // reconcile FROM the sinks: nothing dropped, nothing invented
        val goodBack = s.read.schema(schema).parquet(goodDir)
        val quarBack = s.read.schema(new StructType()
          .add("raw", StringType).add("reason", StringType)).parquet(quarDir)
        val counts = goodBack
          .agg(count(lit(1)).as("n"))
          .select(lit("good").as("status"), lit(null).cast("string").as("reason"),
            col("n"))
          .unionByName(quarBack.groupBy(col("reason"))
            .agg(count(lit(1)).as("n"))
            .select(lit("quarantined").as("status"), col("reason"), col("n")))
        val inputN = s.read.textFile(ingestFixturePath).toDF("line")
          .agg(count(lit(1)).as("n_input"))
        val sinkN = counts.agg(sum(col("n")).as("n_sinks"))
        counts.crossJoin(broadcast(inputN)).crossJoin(broadcast(sinkN))
          .select(col("status"), col("reason"), col("n"),
            (col("n_sinks") === col("n_input")).cast("int").as("reconciled"))
          .orderBy(col("status"), col("reason"))
      },
      Some(s"""WITH raw AS (SELECT line FROM read_csv('$ingestFixturePath',
              |        columns={'line': 'VARCHAR'}, delim='|', quote='',
              |        header=false)),
              |p AS (SELECT line, str_split(line, ',') AS f FROM raw),
              |c AS (SELECT line, f,
              |  (len(f) = 5
              |   AND try_cast(f[1] AS BIGINT) IS NOT NULL
              |   AND try_cast(f[2] AS TIMESTAMP) IS NOT NULL
              |   AND try_cast(f[3] AS BIGINT) IS NOT NULL
              |   AND try_cast(f[5] AS DOUBLE) IS NOT NULL) AS ok,
              |  CASE WHEN len(f) <> 5 THEN 'field_count:' || len(f)
              |       WHEN try_cast(f[1] AS BIGINT) IS NULL THEN 'bad_event_id'
              |       WHEN try_cast(f[2] AS TIMESTAMP) IS NULL THEN 'bad_ts'
              |       WHEN try_cast(f[3] AS BIGINT) IS NULL THEN 'bad_user_id'
              |       WHEN try_cast(f[5] AS DOUBLE) IS NULL THEN 'bad_value'
              |       ELSE 'unknown' END AS reason FROM p),
              |g AS (SELECT 'good' AS status, NULL AS reason,
              |             CAST(count(*) AS BIGINT) AS n FROM c WHERE ok
              |      UNION ALL
              |      SELECT 'quarantined', reason, CAST(count(*) AS BIGINT)
              |      FROM c WHERE NOT ok GROUP BY reason),
              |t AS (SELECT count(*) AS n_input FROM raw),
              |st AS (SELECT sum(n) AS n_sinks FROM g)
              |SELECT status, reason, n,
              |  CAST(n_sinks = n_input AS INT) AS reconciled
              |FROM g, t, st
              |ORDER BY status, reason""".stripMargin)),

    // ---- i03: schema evolution on the lake path — the week-one 100 TB
    // ingest event: a landing dir whose LATER batch carries an added
    // nullable column. Batch 1 is written with the v1 schema, batch 2
    // with v2 (+quality_score); the read is mergeSchema + an EXPLICIT
    // reconciliation to the declared v2 schema (never inference-only).
    // Green certifies old rows null-fill and new rows keep the column —
    // the oracle recomputes the expected per-batch aggregate from the
    // SOURCE table, so the write → evolved read → reconcile round trip
    // is certified end-to-end (the q39 pattern).
    Q("i03_schema_evolution", { (s, dir) =>
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"))
        val base = graft.RunDirs.dir("i03")
        val b1 = base.resolve("batch1").toString
        val b2 = base.resolve("batch2").toString
        val v1 = ev.filter(pmod(col("event_id"), lit(2)) === 0)
          .withColumn("batch", lit(1))
        val v2 = ev.filter(pmod(col("event_id"), lit(2)) === 1)
          .withColumn("batch", lit(2))
          .withColumn("quality_score", pmod(col("event_id"), lit(7)))
        writeParquet(v1, b1)
        writeParquet(v2, b2)
        val merged = s.read.option("mergeSchema", "true").parquet(b1, b2)
        // reconcile to the DECLARED evolved schema — explicit casts, so a
        // future type drift fails here, not three queries downstream
        val declared = merged.select(
          col("event_id").cast("long").as("event_id"),
          col("batch").cast("int").as("batch"),
          col("quality_score").cast("long").as("quality_score"))
        declared.groupBy(col("batch"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("quality_score").isNull, 1L).otherwise(0L))
              .as("n_null_quality"),
            sum(coalesce(col("quality_score"), lit(0L))).as("sum_quality"))
          .orderBy(col("batch"))
      },
      Some("""SELECT batch, n, n_null_quality, sum_quality FROM (
             |  SELECT 1 AS batch, CAST(count(*) AS BIGINT) AS n,
             |         CAST(count(*) AS BIGINT) AS n_null_quality,
             |         CAST(0 AS BIGINT) AS sum_quality
             |  FROM events WHERE event_id % 2 = 0
             |  UNION ALL
             |  SELECT 2, CAST(count(*) AS BIGINT),
             |         CAST(0 AS BIGINT),
             |         CAST(sum(event_id % 7) AS BIGINT)
             |  FROM events WHERE event_id % 2 = 1)
             |ORDER BY batch""".stripMargin)),

    // ---- i05: schema evolution the mergeSchema reader CANNOT do — the
    // other two week-one lake events (r10 verdict #2): a column whose
    // TYPE widens across batches (int→long id, float→double score) and a
    // column RENAMED between batches (score_v1 → score_v2), mapped via
    // an explicit alias table. mergeSchema throws on the type conflict
    // and would fork score_v1/score_v2 into two half-null columns — so
    // the production answer is per-batch reconciliation: each landing
    // dir is read AS WRITTEN, renamed through the declared alias map,
    // cast to the declared schema, then unioned. Batch 2 ids sit past
    // 2^31 so a silently-narrowed read would overflow loudly.
    //
    // Certificate: per-batch count, id range, id sum, and an exact
    // value checksum sum(floor(score·10⁴)) — floor, not round, so no
    // half-way tie rule can differ between engines; batch 1 scores pass
    // through float32, and the oracle applies the same CAST(... AS
    // REAL) quantization, so a reconciliation that lost the widened
    // bits (or read the renamed column as null) hashes red. Oracle
    // recomputes from the SOURCE events table (the q39/i03 pattern).
    Q("i05_schema_widening", { (s, dir) =>
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("event_id"), col("value"))
        val base = graft.RunDirs.dir("i05")
        val b1 = base.resolve("batch1").toString
        val b2 = base.resolve("batch2").toString
        // v1: narrow types + old column name
        val v1 = ev.filter(pmod(col("event_id"), lit(2)) === 0).select(
          pmod(col("event_id"), lit(1000000000L)).cast("int").as("id"),
          col("value").cast("float").as("score_v1"),
          lit(1).as("batch"))
        // v2: widened types + renamed column, ids past int range
        val v2 = ev.filter(pmod(col("event_id"), lit(2)) === 1).select(
          (pmod(col("event_id"), lit(1000000000L)) + lit(5000000000L))
            .as("id"),
          col("value").as("score_v2"),
          lit(2).as("batch"))
        writeParquet(v1, b1)
        writeParquet(v2, b2)
        // the declared schema + alias table are the ONLY contract; each
        // batch reconciles independently, so a third batch with yet
        // another historical name is one map entry away
        val aliases = Map("score_v1" -> "score", "score_v2" -> "score")
        def reconcile(df: org.apache.spark.sql.DataFrame)
            : org.apache.spark.sql.DataFrame = {
          val renamed = df.columns.foldLeft(df) { (d, c) =>
            aliases.get(c).map(d.withColumnRenamed(c, _)).getOrElse(d)
          }
          renamed.select(col("id").cast("long").as("id"),
            col("score").cast("double").as("score"),
            col("batch").cast("int").as("batch"))
        }
        val declared = reconcile(s.read.parquet(b1))
          .unionByName(reconcile(s.read.parquet(b2)))
        declared.groupBy(col("batch"))
          .agg(count(lit(1)).as("n"),
            min(col("id")).as("min_id"), max(col("id")).as("max_id"),
            sum(col("id")).as("sum_id"),
            sum(floor(col("score") * 10000)).as("score_chk"))
          .orderBy(col("batch"))
      },
      Some("""SELECT batch, n, min_id, max_id, sum_id, score_chk FROM (
             |  SELECT 1 AS batch, CAST(count(*) AS BIGINT) AS n,
             |    CAST(min(event_id % 1000000000) AS BIGINT) AS min_id,
             |    CAST(max(event_id % 1000000000) AS BIGINT) AS max_id,
             |    CAST(sum(event_id % 1000000000) AS BIGINT) AS sum_id,
             |    CAST(sum(CAST(floor(
             |      CAST(CAST(value AS REAL) AS DOUBLE) * 10000) AS BIGINT))
             |      AS BIGINT) AS score_chk
             |  FROM events WHERE event_id % 2 = 0
             |  UNION ALL
             |  SELECT 2, CAST(count(*) AS BIGINT),
             |    CAST(min(event_id % 1000000000 + 5000000000) AS BIGINT),
             |    CAST(max(event_id % 1000000000 + 5000000000) AS BIGINT),
             |    CAST(sum(event_id % 1000000000 + 5000000000) AS BIGINT),
             |    CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
             |  FROM events WHERE event_id % 2 = 1)
             |ORDER BY batch""".stripMargin)),

    // ---- st15: streaming ingest with the circuit breaker (batch form) --
    // i01's classification under replay chunking + the i04 breaker rule
    // applied PER CHUNK — the shape `readStream → foreachBatch {
    // tolerant parse → quarantineRateMetrics → requireQuarantineRate }`
    // runs in production, where one poisoned micro-batch must stop the
    // stream while background noise flows. This registered form computes
    // the same per-chunk ledger deterministically (chunk = length(line)
    // mod 3 — content-derived, so both engines and the spec's replay
    // files agree); StreamingSpec replays the SAME chunks as files, one
    // per trigger, proving stream metrics == this batch ledger and that
    // requireQuarantineRate in foreachBatch kills the query on the
    // 750000-ppm chunk. The 400000-ppm threshold splits the fixture:
    // one chunk flows, two trip.
    Q("st15_stream_ingest_breaker", { (s, _) =>
        val schema = new StructType()
          .add("event_id", LongType).add("ts", TimestampType)
          .add("user_id", LongType).add("event_type", StringType)
          .add("value", DoubleType)
        val lines = s.read.textFile(ingestFixturePath).toDF("line")
        ingestChunkMetrics(lines, schema, maxBadPpm = 400000L)
          .orderBy(col("chunk_id"))
      },
      Some(s"""WITH raw AS (SELECT line FROM read_csv('$ingestFixturePath',
              |        columns={'line': 'VARCHAR'}, delim='|', quote='',
              |        header=false)),
              |p AS (SELECT line, str_split(line, ',') AS f FROM raw),
              |c AS (SELECT CAST(length(line) % 3 AS INT) AS chunk_id,
              |  (len(f) = 5
              |   AND try_cast(f[1] AS BIGINT) IS NOT NULL
              |   AND try_cast(f[2] AS TIMESTAMP) IS NOT NULL
              |   AND try_cast(f[3] AS BIGINT) IS NOT NULL
              |   AND try_cast(f[5] AS DOUBLE) IS NOT NULL) AS ok FROM p),
              |g AS (SELECT chunk_id, CAST(count(*) AS BIGINT) AS n_input,
              |        CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
              |          AS n_quarantined
              |      FROM c GROUP BY chunk_id)
              |SELECT chunk_id, n_input, n_quarantined,
              |  CAST(1000000 * n_quarantined // greatest(n_input, 1)
              |       AS BIGINT) AS bad_ppm,
              |  CAST(400000 AS BIGINT) AS max_bad_ppm,
              |  CAST(1000000 * n_quarantined // greatest(n_input, 1)
              |       > 400000 AS INT) AS tripped
              |FROM g
              |ORDER BY chunk_id""".stripMargin)),
  )
}
