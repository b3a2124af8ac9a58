package graft

import graft.functions.Skew
import graft.sources.Formats
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class FormatsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("CSV round-trip preserves values exactly (longs, doubles, strings)") {
    val src = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_returnflag")
    val tmp = Files.createTempDirectory("graft-csv").toString
    Formats.writeCsv(src, tmp)
    val back = Formats.readCsv(spark, tmp, src.schema)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("JSON round-trip preserves values") {
    val src = Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_acctbal")
    val tmp = Files.createTempDirectory("graft-json").toString
    Formats.writeJson(src, tmp)
    val back = Formats.readJson(spark, tmp, src.schema)
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("FAILFAST csv read throws on malformed rows") {
    val tmp = Files.createTempDirectory("graft-bad").toString
    Files.writeString(java.nio.file.Paths.get(tmp, "bad.csv"), "1,x\n2,3\n")
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType)))
    intercept[Exception] {
      Formats.readCsv(spark, tmp, schema).collect()
    }
  }

  test("partitioned parquet write enables partition pruning") {
    val src = Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
    val tmp = Files.createTempDirectory("graft-part").toString
    Formats.writeParquet(src, tmp, partitionBy = Seq("o_orderstatus"))
    val pruned = spark.read.parquet(tmp).filter($"o_orderstatus" === "O")
    // pruning: only the o_orderstatus=O directory is listed in the scan
    val scanDesc = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ===
      src.filter($"o_orderstatus" === "O").count())
    assert(!scanDesc.contains("o_orderstatus=F"))
  }

  test("ORC round-trip preserves values and pushes filters to the scan") {
    val src = Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal")
    val tmp = Files.createTempDirectory("graft-orc").toString
    Formats.writeOrc(src, tmp)
    val back = Formats.readOrc(spark, tmp, src.schema)
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
    val filtered = back.filter($"c_custkey" < 100)
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
      s"ORC scan did not receive the pushed filter:\n$plan")
  }

  test("co-bucketed tables join without a shuffle exchange") {
    // default warehouse dir (./spark-warehouse, gitignored) — the
    // warehouse conf is static and can't be set per-test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.load(spark, dir, "orders").select($"o_orderkey", $"o_custkey")
      val li = Tables.load(spark, dir, "lineitem").select($"l_orderkey", $"l_quantity")
      Formats.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 8)
      Formats.writeBucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", Seq("o_orderkey"), 8)
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(joined.count() === li.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    }
  }

  test("compaction: many small files -> sized file count, content identical") {
    val base = Files.createTempDirectory("graft-compact").toString
    val rows = spark.range(50000L)
      .select(col("id"), (col("id") % 97).as("k"),
        concat(lit("v"), col("id")).as("v"))
    // 200 tiny files: the streaming-sink landing-dir pathology
    rows.repartition(200).write.parquet(s"$base/in")
    val inFiles = spark.read.parquet(s"$base/in").inputFiles.length
    assert(inFiles >= 190, s"fixture did not fragment: $inFiles files")
    val n = Formats.compactParquet(spark, s"$base/in", s"$base/out",
      targetBytes = 256L << 10)
    val outFiles = spark.read.parquet(s"$base/out").inputFiles.length
    assert(outFiles === n)
    assert(outFiles < inFiles / 10,
      s"compaction barely helped: $inFiles -> $outFiles")
    // row-identical, not just count-identical
    val a = rows.collect().map(_.toSeq).toSet
    val b = spark.read.parquet(s"$base/out").collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("salted aggregation equals direct aggregation") {
    val ev = Tables.load(spark, dir, "events")
    val direct = ev.groupBy($"user_id".as("key"))
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), math.round(r.getDouble(2) * 100)))).toMap
    val salted = Skew.saltedAggregate(ev, $"user_id", $"event_id", 16,
        Map("total" -> $"value"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), math.round(r.getDouble(2) * 100)))).toMap
    assert(salted === direct)
  }

  test("readCsvQuarantine: every corruption class quarantined, nothing dropped, nothing fatal") {
    val schema = new StructType()
      .add("event_id", LongType).add("ts", TimestampType)
      .add("user_id", LongType).add("event_type", StringType)
      .add("value", DoubleType)
    val df = Formats.readCsvQuarantine(spark,
      Formats.ingestFixturePath, schema).cache()
    val total = df.count()
    val bad = df.filter($"_corrupt".isNotNull)
    val good = df.filter($"_corrupt".isNull)
    // quarantined != dropped != job-failed: all 11 planted lines land
    assert(total === 11)
    assert(bad.count() === 6)
    assert(good.count() === 5)
    // quarantine keeps the raw line byte-for-byte (re-ingestable later)
    val rawLines = bad.select($"_corrupt").as[String].collect().toSet
    assert(rawLines.contains("garbage line without any delimiter structure"))
    assert(rawLines.contains("4,2024-01-01 00:20:00")) // too few fields
    assert(rawLines.exists(_.endsWith("extracolumn")))  // too many fields
    assert(rawLines.exists(_.startsWith("notanumber"))) // bad BIGINT
    assert(rawLines.exists(_.endsWith("notadouble")))   // bad DOUBLE
    assert(rawLines.exists(_.contains("2024-13-45")))   // bad TIMESTAMP
    // good rows parsed fully typed
    assert(good.select($"event_id").as[Long].collect().sorted
      === Array(1L, 2L, 3L, 7L, 9L))
    df.unpersist()
  }

  test("requireQuarantineRate: trips on a broken feed, passes background noise") {
    val schema = new StructType()
      .add("event_id", LongType).add("ts", TimestampType)
      .add("user_id", LongType).add("event_type", StringType)
      .add("value", DoubleType)
    val parsed = Formats.readCsvQuarantine(spark,
      Formats.ingestFixturePath, schema).localCheckpoint()
    // fixture rate = 6/11 = 545,454 ppm: a 30% policy must throw...
    val e = intercept[IllegalStateException] {
      Formats.requireQuarantineRate(parsed, maxBadPpm = 300000L)
    }
    assert(e.getMessage.contains("545454 ppm"))
    // ...and a 60% policy must let the batch through
    Formats.requireQuarantineRate(parsed, maxBadPpm = 600000L)
    val m = Formats.quarantineRateMetrics(parsed, 300000L).head()
    assert(m.getAs[Long]("n_input") === 11L)
    assert(m.getAs[Long]("n_quarantined") === 6L)
    assert(m.getAs[Long]("bad_ppm") === 545454L)
  }

  test("readJsonQuarantine: malformed and mistyped JSON lines routed, good lines parsed") {
    val tmp = Files.createTempDirectory("graft-json-q")
    val lines = Seq(
      """{"id": 1, "v": 1.5}""",
      """{"id": 2, "v": 2.0}""",
      """{"id": "notanumber", "v": 3.0}""", // type mismatch
      """{broken json""",                   // parse failure
      """{"id": 4, "v": 0.25}""")
    java.nio.file.Files.write(tmp.resolve("data.json"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val schema = new StructType().add("id", LongType).add("v", DoubleType)
    val df = Formats.readJsonQuarantine(spark, tmp.toString, schema).cache()
    assert(df.count() === 5)
    val bad = df.filter($"_corrupt".isNotNull).select($"_corrupt").as[String]
      .collect().toSet
    assert(bad === Set("""{"id": "notanumber", "v": 3.0}""", """{broken json"""))
    assert(df.filter($"_corrupt".isNull).select($"id").as[Long].collect().sorted
      === Array(1L, 2L, 4L))
    df.unpersist()
  }
}
