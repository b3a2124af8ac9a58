package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Dev probe (not part of the driver contract): run every registered
  * query against an empty-but-schemaed copy of the fixture tables and
  * report which ones throw. The zero-row corpus is the day-2-with-no-
  * new-data shape every incremental pipeline eventually feeds the
  * engine; EmptyInputSpec turns this probe's expectation into a gate. */
object EmptyProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val dir = if (args.length > 1) args(1)
              else graft.RunDirs.dir("empty_sf").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach { t =>
      Tables.load(spark, src, t).limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    var bad = List.empty[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, dir).count()
        println(s"OK   $name rows=$n")
      } catch {
        case e: Throwable =>
          val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}"
          bad ::= (name, msg)
          println(s"FAIL $name $msg")
      }
    }
    println(s"\n${bad.size} queries throw on empty input:")
    bad.reverse.foreach { case (n, m) => println(s"  $n  $m") }
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}
