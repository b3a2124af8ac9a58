package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the schema-adaptive events loader across physical `ts` layouts:
  * legacy INT64 TIMESTAMP(NANOS) (the committed `events_nanos.parquet`
  * fixture — Spark can only read, never write, that layout), today's
  * native timestamp[us] (the sf fixtures), and the failure mode of a
  * directory that mixes both. */
class TablesSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val nanosFixture = Paths.get("src/test/resources/events_nanos.parquet")

  /** Expected micros for the fixture's three rows: ns div 1000
    * (base 1.7e18 ns = 1700000000000000 us, plus each row's offset). */
  private val expectedMicros = Seq(
    1700000001234567L, 1700000002000000L, 1700000003999999L)

  private def freshEventsDir(): String = {
    val d = Files.createTempDirectory("graft_tables_spec")
    Files.createDirectory(d.resolve("events.parquet"))
    d.toFile.deleteOnExit()
    d.toString
  }

  private def addNanosFile(dir: String, name: String = "part-nanos.parquet"): Unit =
    Files.copy(nanosFixture, Paths.get(dir, "events.parquet", name),
      StandardCopyOption.REPLACE_EXISTING)

  private def addNativeFile(dir: String): Unit = {
    val tmp = Files.createTempDirectory("graft_native_write").toString
    Seq((4L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000100L)),
        30L, "view", 4.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.copy(Paths.get(part), Paths.get(dir, "events.parquet", "part-native.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
  }

  test("legacy TIMESTAMP(NANOS) layout: TimestampType surfaced, nanos truncated to micros") {
    val dir = freshEventsDir()
    addNanosFile(dir)
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    val micros = df.orderBy("event_id")
      .select(unix_micros(col("ts"))).as[Long].collect().toSeq
    assert(micros === expectedMicros)
  }

  test("native timestamp[us] layout: passthrough, same normalized view") {
    val dir = freshEventsDir()
    addNativeFile(dir)
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select(unix_micros(col("ts"))).as[Long].collect().toSeq ===
      Seq(1700000100000000L))
  }

  test("mixed-layout directory fails loudly, never decodes nonsense") {
    val dir = freshEventsDir()
    addNanosFile(dir)
    addNativeFile(dir)
    val outcome =
      try {
        val rows = Tables.load(spark, dir, "events")
          .select(col("event_id"), unix_micros(col("ts")).as("us"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        Right(rows)
      } catch { case e: Throwable => Left(e) }
    outcome match {
      case Left(_) => // loud failure at scan time: acceptable, pinned
      case Right(rows) =>
        // if Spark DID read both files, every value must be CORRECT —
        // silent misdecoding (e.g. micros reinterpreted as nanos) is the
        // landmine this test exists to catch
        assert(rows(1L) === expectedMicros(0))
        assert(rows(4L) === 1700000100000000L)
    }
    info(s"mixed-layout outcome: ${outcome.fold(e => s"LOUD FAIL: ${e.getClass.getSimpleName}", r => s"read ${r.size} rows correctly")}")
  }

  test("streamed directory: a late file in the OTHER layout fails loudly, never decodes nonsense") {
    // readEventsStream's scaladoc: the probed layout is declared for the
    // stream's lifetime; a later file with the other physical type must
    // fail the declared schema at scan time, not decode garbage.
    val dir = freshEventsDir()
    addNativeFile(dir)
    val path = Paths.get(dir, "events.parquet").toString
    val q = graft.streaming.EventStreams.readEventsStream(spark, path)
      .writeStream.outputMode("append").format("memory")
      .queryName("mixed_stream_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("mixed_stream_out").count() === 1)
      addNanosFile(dir)
      val outcome =
        try {
          q.processAllAvailable()
          Right(spark.table("mixed_stream_out")
            .select(unix_micros(col("ts"))).as[Long].collect().toSet)
        } catch { case e: Throwable => Left(e) }
      outcome match {
        case Left(_) => // loud failure in the micro-batch: pinned
        case Right(micros) =>
          // if the engine DID read the late file, every value must be
          // correct — silent misdecoding is what this test forbids
          assert(micros === (expectedMicros.toSet + 1700000100000000L))
      }
      info(s"late-wrong-layout outcome: ${outcome.fold(e => s"LOUD FAIL: ${e.getClass.getSimpleName}", m => s"read correctly (${m.size} distinct ts)")}")
    } finally q.stop()
  }

  test("readEventsStream on an empty directory falls back to the native layout") {
    val dir = Files.createTempDirectory("graft_empty_stream").toString
    val df = graft.streaming.EventStreams.readEventsStream(spark, dir)
    assert(df.isStreaming)
    assert(df.schema("ts").dataType === TimestampType)
  }
}
