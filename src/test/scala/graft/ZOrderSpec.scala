package graft

import graft.functions.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Z-order clustering (q53): the address round-trips, and the layout it
  * induces actually skips files under a 2-D predicate — counted on real
  * written parquet, not asserted from theory. */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("spread/unspread round-trips any 31-bit coordinate pair") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(500)((rnd.nextInt(Int.MaxValue).toLong,
      rnd.nextInt(Int.MaxValue).toLong)) :+ ((0L, 0L)) :+
      ((Int.MaxValue.toLong, Int.MaxValue.toLong))
    val bad = pairs.toDF("x", "y")
      .withColumn("z", ZOrder.z("x", "y"))
      .withColumn("rx", expr(ZOrder.unspreadSql("z")))
      .withColumn("ry", expr(ZOrder.unspreadSql("(z >> 1)")))
      .filter(col("rx") =!= col("x") || col("ry") =!= col("y"))
      .count()
    assert(bad === 0L)
  }

  test("z-order is monotone within an aligned quad: distinct buckets partition the space") {
    // every (x, y) in an aligned 64x64 quad shares the z >> 12 bucket,
    // and neighboring quads never collide — the invariant behind q53's
    // box_ok column
    val quad = (0 until 64).flatMap(i => (0 until 64).map(j =>
      (128L + i, 64L + j))).toDF("x", "y")
    val buckets = quad.select(expr(s"${ZOrder.zSql("x", "y")} >> 12").as("b"))
      .distinct().as[Long].collect()
    assert(buckets.length === 1)
    val other = Seq((192L, 64L), (128L, 128L), (64L, 64L)).toDF("x", "y")
      .select(expr(s"${ZOrder.zSql("x", "y")} >> 12").as("b"))
      .distinct().as[Long].collect()
    assert(other.forall(_ != buckets.head))
  }

  test("2-D range predicate intersects a fraction of z-clustered files vs all hash files") {
    val src = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_partkey").cast("long").as("x"),
        col("l_suppkey").cast("long").as("y"))
    val hashDir = Files.createTempDirectory("graft-zhash").toString
    val zDir = Files.createTempDirectory("graft-zord").toString
    src.repartition(32).write.mode("overwrite").parquet(hashDir)
    ZOrder.cluster(src, "x", "y", files = 32).write.mode("overwrite").parquet(zDir)

    // the file-level pruning a footer-stats reader performs: which files'
    // (min, max) boxes intersect the predicate box? (aligned so the
    // query region is a handful of z-quads)
    val (xLo, xHi, yLo, yHi) = (512L, 767L, 0L, 63L)
    def intersecting(dir: String): Long = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("x")).as("nx"), max(col("x")).as("mx"),
        min(col("y")).as("ny"), max(col("y")).as("my"))
      .filter(col("nx") <= xHi && col("mx") >= xLo &&
        col("ny") <= yHi && col("my") >= yLo)
      .count()
    val hashFiles = intersecting(hashDir)
    val zFiles = intersecting(zDir)
    // hash layout: every file sees the full value range -> all 32 overlap.
    // z layout: only the files owning the query box's z-range do.
    assert(hashFiles === 32L, s"hash layout should be unprunable, got $hashFiles")
    assert(zFiles * 4 <= hashFiles, s"z layout pruned to $zFiles of $hashFiles")

    // and the skipping is real on scan: Spark's parquet row-group pruning
    // reads fewer rows from the clustered layout under the same filter
    val pred = s"x BETWEEN $xLo AND $xHi AND y BETWEEN $yLo AND $yHi"
    val a = spark.read.parquet(hashDir).filter(pred).count()
    val b = spark.read.parquet(zDir).filter(pred).count()
    assert(a === b, "layout must never change results")
  }
}
