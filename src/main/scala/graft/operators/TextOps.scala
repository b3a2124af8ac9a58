package graft.operators

import graft.{Q, Tables}
import graft.functions.{Stopwords, TextFns}
import org.apache.spark.sql.functions._

/** Text-analysis queries over the `documents` table: token statistics,
  * quality scoring, language ID, content fingerprinting. All pure column
  * expressions (whole-stage codegen, no UDFs) with exact DuckDB oracles.
  *
  * At 100 TB these are embarrassingly parallel scan-only passes — no
  * shuffle at all until an aggregation is requested, so they scale with
  * input bandwidth.
  */
object TextOps {

  private def inListSql(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  private def scoreSql(words: Seq[String]): String =
    s"len(list_filter(t, x -> x IN ${inListSql(words)}))"

  private val normSql = TextFns.normalizeSql("text")
  private val toksSql = TextFns.tokensSql("text")

  val queries: Seq[Q] = Seq(

    // ---- t01: token statistics -----------------------------------------
    Q("t01_token_stats",
      (s, dir) => Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextFns.tokenCount(col("text")).as("n_tokens"),
          TextFns.bpeishTokenCount(col("text")).as("n_bpeish"),
          length(TextFns.normalizeText(col("text"))).as("n_chars_norm"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  len($toksSql) AS n_tokens,
              |  len(regexp_extract_all($normSql, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpeish,
              |  length($normSql) AS n_chars_norm
              |FROM documents
              |ORDER BY doc_id""".stripMargin)),

    // ---- t02: quality heuristics ---------------------------------------
    Q("t02_quality",
      (s, dir) => Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextFns.punctRatio(col("text")).as("punct_ratio"),
          TextFns.stopwordRatio(col("text")).as("stopword_ratio"),
          TextFns.avgTokenLen(col("text")).as("avg_token_len"),
          TextFns.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id")),
      Some(s"""WITH d AS (SELECT doc_id, $normSql AS n, $toksSql AS t FROM documents)
              |SELECT doc_id,
              |  round(length(regexp_replace(n, '[a-z0-9 ]', '', 'g'))::DOUBLE
              |        / greatest(length(n), 1), 4) AS punct_ratio,
              |  round(${scoreSql(Stopwords.en)}::DOUBLE / greatest(len(t), 1), 4) AS stopword_ratio,
              |  round((length(n) - (len(t) - 1))::DOUBLE / greatest(len(t), 1), 4) AS avg_token_len,
              |  round((CASE WHEN len(t) >= 10 THEN 0.4 ELSE 0.0 END)
              |      + (CASE WHEN round(length(regexp_replace(n, '[a-z0-9 ]', '', 'g'))::DOUBLE
              |                       / greatest(length(n), 1), 4) <= 0.1 THEN 0.3 ELSE 0.0 END)
              |      + (CASE WHEN round(${scoreSql(Stopwords.en)}::DOUBLE / greatest(len(t), 1), 4) >= 0.05
              |              THEN 0.3 ELSE 0.0 END), 2) AS quality
              |FROM d
              |ORDER BY doc_id""".stripMargin)),

    // ---- t03: language identification ----------------------------------
    Q("t03_langid",
      (s, dir) => Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextFns.langId(col("text")).as("pred_lang"),
          col("lang"),
          (TextFns.langId(col("text")) === col("lang")).as("is_match"))
        .orderBy(col("doc_id")),
      Some(s"""WITH d AS (SELECT doc_id, lang, text, $toksSql AS t FROM documents),
              |scored AS (SELECT doc_id, lang,
              |  regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS cjk,
              |  ${scoreSql(Stopwords.en)} AS en_s,
              |  ${scoreSql(Stopwords.de)} AS de_s,
              |  ${scoreSql(Stopwords.fr)} AS fr_s,
              |  ${scoreSql(Stopwords.es)} AS es_s
              |FROM d)
              |SELECT doc_id,
              |  CASE WHEN cjk THEN 'zh'
              |       WHEN de_s > greatest(en_s, fr_s, es_s) THEN 'de'
              |       WHEN fr_s > greatest(en_s, es_s) THEN 'fr'
              |       WHEN es_s > en_s THEN 'es'
              |       ELSE 'en' END AS pred_lang,
              |  lang,
              |  (CASE WHEN cjk THEN 'zh'
              |        WHEN de_s > greatest(en_s, fr_s, es_s) THEN 'de'
              |        WHEN fr_s > greatest(en_s, es_s) THEN 'fr'
              |        WHEN es_s > en_s THEN 'es'
              |        ELSE 'en' END) = lang AS is_match
              |FROM scored
              |ORDER BY doc_id""".stripMargin)),

    // ---- t04: content fingerprint --------------------------------------
    Q("t04_fingerprint",
      (s, dir) => Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextFns.fingerprint(col("text")).as("fp"),
          col("source"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, md5($normSql) AS fp, source
              |FROM documents
              |ORDER BY doc_id""".stripMargin)),
  )
}
