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

  /** `events.parquet` carries TIMESTAMP(NANOS) which the vectorized parquet
    * reader rejects; read nanos as long and truncate to micros (matching
    * DuckDB's ns→us cast) so `ts` is a normal timestamp column. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Register every table as a temp view so `spark.sql` mirrors the DuckDB
    * oracle's view of the data. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
