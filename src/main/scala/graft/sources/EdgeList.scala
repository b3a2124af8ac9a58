package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delimiter-configurable edge-list text source.
  *
  * Replaces the reference's scan + parse stage (`mapreducePredictionTwitter
  * .java:26-40`: `sc.textFile` + split on `\\s` / `"\t"` + `Long.parseLong`).
  * The reference hardcoded the delimiter per driver class (base used
  * whitespace, the ten experiment drivers used tab — SURVEY.md §1.4); here it
  * is a scan option. Parse failures fail the query (ANSI cast), matching the
  * reference's uncaught `NumberFormatException` fail-fast semantics.
  *
  * Scan parallelism comes from `spark.sql.files.maxPartitionBytes` +
  * AQE — the scale-portable replacement for the reference's hand-tuned
  * `mapred.max.split.size` (`mapreducePredictionTwitter100.java:20`).
  */
object EdgeList {

  /** Read an edge list as a `DataFrame(src BIGINT, dst BIGINT)`. */
  def read(spark: SparkSession, path: String, delimiter: String = "\\s+"): DataFrame =
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), delimiter).as("f"))
      .select(
        element_at(col("f"), 1).cast("long").as("src"),
        element_at(col("f"), 2).cast("long").as("dst"))
}
