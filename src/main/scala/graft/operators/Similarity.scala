package graft.operators

import graft.{Q, Tables}
import graft.functions.{PortableHash, VectorFns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k via a broadcast join of the
  *     query set against the corpus — the correctness baseline. At 100 TB
  *     the corpus side stays partitioned and scanned once; only the
  *     (small) query set is broadcast, so there is no shuffle at all.
  *   - [[lshTopK]]: random-hyperplane LSH — corpus and queries are
  *     bucketed by sign-pattern, the join is equi on bucket, and only
  *     in-bucket candidates pay the exact cosine. The scale path: bucket
  *     count grows 2^planes, the join stays equi-keyed (AQE-friendly),
  *     and recall trades off against planes.
  */
object Similarity {

  /** Deterministic hyperplane component i of plane k, in [-1, 1] — derived
    * from the portable hash so both engines (and every run) agree. */
  private def planeComponent(k: Int, i: Int): Double = {
    // same construction as PortableHash.baseHash, in pure Scala
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp_${k}_$i".getBytes("UTF-8"))
    val v = java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    (v % 2001L - 1000L).toDouble / 1000.0
  }

  /** Sign-pattern bucket id from `planes` random hyperplanes. */
  def lshBucket(e: Column, dim: Int, planes: Int): Column =
    (0 until planes).map { k =>
      val d = (0 until dim).map(i => element_at(e, i + 1) * lit(planeComponent(k, i)))
        .reduce(_ + _)
      when(d > 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded), ranked on cosine rounded to 6dp with vec_id
    * tiebreak (deterministic + engine-portable). */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    val corpus = emb.select(col("vec_id"), VectorFns.toDouble(col("embedding")).as("e"))
      .withColumn("nrm", VectorFns.norm(col("e")))
    val qs = queries.select(col("vec_id").as("qid"), VectorFns.toDouble(col("embedding")).as("qe"))
      .withColumn("qnrm", VectorFns.norm(col("qe")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    corpus.join(broadcast(qs), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(VectorFns.dot(col("qe"), col("e")) / (col("qnrm") * col("nrm")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed cosine top-k: exact cosine only within the query's
    * bucket. Returns the same shape as [[bruteForceTopK]]; recall < 1. */
  def lshTopK(emb: DataFrame, queries: DataFrame, k: Int, dim: Int = 64,
      planes: Int = 8): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    val corpus = emb.select(col("vec_id"), VectorFns.toDouble(col("embedding")).as("e"))
      .withColumn("nrm", VectorFns.norm(col("e")))
      .withColumn("bucket", lshBucket(col("e"), dim, planes))
    val qs = queries.select(col("vec_id").as("qid"), VectorFns.toDouble(col("embedding")).as("qe"))
      .withColumn("qnrm", VectorFns.norm(col("qe")))
      .withColumn("bucket", lshBucket(col("qe"), dim, planes))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    corpus.join(broadcast(qs), Seq("bucket"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(VectorFns.dot(col("qe"), col("e")) / (col("qnrm") * col("nrm")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  val queries: Seq[Q] = Seq(

    // ---- s01: exact cosine top-10 for query vectors 0..4 ---------------
    Q("s01_cosine_topk",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        bruteForceTopK(emb, emb.filter(col("vec_id") < 5), 10)
          .orderBy(col("qid"), col("rank"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |q AS (SELECT vec_id AS qid, e AS qe FROM e WHERE vec_id < 5),
             |scored AS (SELECT qid, vec_id,
             |    round(list_cosine_similarity(qe, e.e), 6) AS cos
             |  FROM e CROSS JOIN q
             |  WHERE qid <> vec_id),
             |ranked AS (SELECT qid, vec_id, cos,
             |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
             |  FROM scored)
             |SELECT qid, vec_id, cos, rank
             |FROM ranked WHERE rank <= 10
             |ORDER BY qid, rank""".stripMargin)),

    // ---- s02: LSH-bucketed ANN (scale path; rows-only check) -----------
    Q("s02_lsh_topk",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        lshTopK(emb, emb.filter(col("vec_id") < 50), k = 10, planes = 4)
          .orderBy(col("qid"), col("rank"))
      },
      None),
  )
}
