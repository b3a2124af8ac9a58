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
  * `mapred.max.split.size` (`mapreducePredictionTwitter100.java:20`). For
  * runs that want the reference's exact per-run knob anyway,
  * `maxSplitBytes` sets the same Hadoop property on a per-call conf.
  */
object EdgeList {

  /** Read an edge list as a `DataFrame(src BIGINT, dst BIGINT)`.
    *
    * `maxSplitBytes` bounds the input split size for THIS read only —
    * the per-run scan knob the reference tuned
    * (`mapreducePredictionTwitter100.java:20` sets
    * `mapred.max.split.size` so ~147 map tasks cover the input; this is
    * the same `mapreduce.input.fileinputformat.split.maxsize` property on
    * a cloned Hadoop conf, so concurrent reads are unaffected). Left
    * unset, the DataFrame text scan splits by
    * `spark.sql.files.maxPartitionBytes` + AQE, which is the right
    * default at any scale. */
  def read(spark: SparkSession, path: String, delimiter: String = "\\s+",
      maxSplitBytes: Option[Long] = None): DataFrame = {
    val lines: DataFrame = maxSplitBytes match {
      case None => spark.read.text(path)
      case Some(b) =>
        require(b > 0, s"maxSplitBytes must be positive, got $b")
        val conf = new org.apache.hadoop.conf.Configuration(
          spark.sparkContext.hadoopConfiguration)
        conf.setLong("mapreduce.input.fileinputformat.split.maxsize", b)
        val rdd = spark.sparkContext.newAPIHadoopFile(
          path,
          classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
          classOf[org.apache.hadoop.io.LongWritable],
          classOf[org.apache.hadoop.io.Text],
          conf).map(_._2.toString)
        spark.createDataFrame(rdd.map(org.apache.spark.sql.Row(_)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("value",
              org.apache.spark.sql.types.StringType))))
    }
    lines
      .filter(length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), delimiter).as("f"))
      .select(
        element_at(col("f"), 1).cast("long").as("src"),
        element_at(col("f"), 2).cast("long").as("dst"))
  }
}
