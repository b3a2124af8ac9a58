package graft.operators

import graft.{Q, Tables}
import graft.functions.{PortableHash, TextFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus build — the composition a training-data pipeline
  * actually ships, registered as ONE driver-gated query so the operator
  * interfaces are proven to compose, not just to pass in isolation:
  *
  *   quality filter (t02 semantics) → eval-set decontamination (d12) →
  *   exact dedup, keepers only (d01) → sequence packing (t10).
  *
  * Every stage is the library operator, unmodified; the oracle re-derives
  * the whole flow in one SQL CTE chain from the same shared fragments
  * (TextOps.qualitySql, the d12 shingle overlap, the d01 fingerprint, the
  * t10 shard windows), so the gate pins the COMPOSED semantics end to end.
  *
  * Scale notes: the stages keep their individual shapes — scan-parallel
  * quality scoring, broadcast eval shingles (corpus never shuffles for
  * decontamination), shared-exchange dedup aggregate+join, shard-parallel
  * packing windows. Nothing about composing them introduces a new shuffle
  * beyond their own.
  */
object Pipeline {

  def corpusBuild(docs: DataFrame, evalMax: Long = 20,
      minQuality: Double = 0.7, decontamNgram: Int = 5,
      budgetTokens: Int = 512, shards: Int = 8): DataFrame = {
    val corpus = docs.filter(col("doc_id") >= evalMax)
    val evalSet = docs.filter(col("doc_id") < evalMax)
    val qualified = corpus
      .filter(TextFns.qualityScore(col("text")) >= minQuality)
    // WIDE shingles for decontamination (5-gram, the d12 operator's ngram
    // knob): bigrams collide on shared VOCABULARY and would empty a
    // narrow-domain corpus; a 5-gram only collides on copied spans
    val contaminated = Dedup.decontaminate(qualified, evalSet, decontamNgram)
      .filter(col("contaminated") === 1).select(col("doc_id"))
    val clean = qualified.join(contaminated, Seq("doc_id"), "left_anti")
    val keepers = Dedup.exactDedup(clean)
      .filter(!col("is_dup")).select(col("doc_id"))
    val surviving = clean.join(keepers, Seq("doc_id"), "left_semi")
    TextOps.packSequences(surviving, budgetTokens, shards)
  }

  private val normSql = TextFns.normalizeSql("text")
  private val toksSql = TextFns.tokensSql("text")

  val queries: Seq[Q] = Seq(
    // ---- e01: the composed corpus build --------------------------------
    // Output = t10's per-document packing layout, but over only the
    // documents that survive quality + decontamination + dedup. The
    // oracle chains the four stages' SQL fragments over the same data.
    Q("e01_corpus_build",
      (s, dir) => corpusBuild(Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id")),
      Some(s"""WITH d AS (SELECT doc_id, $normSql AS n, $toksSql AS t FROM documents),
              |q AS (SELECT doc_id, n, t FROM d
              |      WHERE doc_id >= 20 AND ${TextOps.qualitySql} >= 0.7),
              |ev AS (SELECT DISTINCT s FROM (
              |        SELECT unnest(list_distinct(list_transform(range(1, len(t) - 3),
              |                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))) AS s
              |        FROM d WHERE doc_id < 20)),
              |qsh AS (SELECT doc_id,
              |         unnest(list_distinct(list_transform(range(1, len(t) - 3),
              |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))) AS s
              |        FROM q),
              |cont AS (SELECT DISTINCT doc_id FROM qsh JOIN ev USING (s)),
              |clean AS (SELECT doc_id, n, t FROM q
              |          WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
              |fp AS (SELECT doc_id, t, md5(n) AS fp FROM clean),
              |keep AS (SELECT doc_id, t FROM (
              |          SELECT doc_id, t, min(doc_id) OVER (PARTITION BY fp) AS k
              |          FROM fp)
              |         WHERE doc_id = k),
              |pk AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
              |        ${PortableHash.baseHashSql("doc_id::VARCHAR")} % 8 AS shard
              |       FROM keep),
              |c AS (SELECT doc_id, shard, n_tokens,
              |        CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
              |             - n_tokens AS BIGINT) AS pre
              |      FROM pk)
              |SELECT doc_id, shard, n_tokens,
              |  CAST(pre // 512 AS BIGINT) AS seq_id,
              |  CAST(pre % 512 AS BIGINT) AS seq_offset
              |FROM c
              |ORDER BY doc_id""".stripMargin)),
  )
}
