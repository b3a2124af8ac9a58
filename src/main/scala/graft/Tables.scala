package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the analytics corpus (TPC-H-ish star schema + events +
  * documents + embeddings, see TESTDATA.md). One parquet file per table under
  * a scale-factor directory.
  *
  * At cluster scale these would be partitioned parquet datasets (or Iceberg
  * tables); the API takes a directory so the same code reads a single file
  * locally or a partitioned tree on a cluster — `spark.read.parquet` handles
  * both, and filter/column pushdown reaches the scan either way.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Schema-adaptive events loader. Writers drift on the physical `ts`
    * type: legacy fixtures carry TIMESTAMP(NANOS) (readable only via
    * `nanosAsLong`, surfacing as LongType nanos), current ones carry native
    * `timestamp[us]` (surfacing as TIMESTAMP_NTZ when the footer says
    * isAdjustedToUTC=false). Branch on the type the scan actually surfaces
    * rather than assuming one layout — at lake scale different table
    * versions/directories come from different writers, so a loader
    * hardcoded to one physical type is a landmine. Adaptivity is
    * per-DIRECTORY: a single directory mixing both layouts fails loudly
    * at scan time (never decodes nonsense) — TablesSpec pins that, along
    * with both homogeneous layouts and the legacy-nanos truncation.
    * Either branch normalizes to a session-tz TIMESTAMP (session tz is
    * pinned UTC in [[GraftSession]]), matching DuckDB's naive-timestamp
    * view of the same files for oracle parity. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // Harmless when ts is already a real timestamp; required for NANOS.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    eventsNormalizeTs(raw)
  }

  /** Normalize an events frame's `ts` to TimestampType whatever the scan
    * surfaced: integral = legacy nanos → truncate to micros (DuckDB's
    * ns→us cast); TIMESTAMP_NTZ → reinterpret in the (UTC) session tz;
    * already TIMESTAMP → passthrough. */
  private[graft] def eventsNormalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType | IntegerType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Register every table as a temp view so `spark.sql` mirrors the DuckDB
    * oracle's view of the data. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
