package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + SQL-parity checks for every registered query.
  *
  * Full DuckDB-oracle validation runs via tools/check_oracle.py (mimicking
  * the driver's gate); here each query must (a) run on sf0.001, (b) return
  * rows, and (c) where the oracle SQL is Spark-parsable, match Spark's own
  * execution of that SQL — catching DataFrame-vs-SQL drift early.
  */
class QueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  // Oracle SQL that Spark parses but executes with DIFFERENT semantics:
  // g08 uses DuckDB printf('%b') (binary formatting) — Spark's printf is
  // java.util.Formatter, where %b means boolean; t13 casts '0x…' hex
  // strings to BIGINT, which DuckDB parses and Spark rejects at runtime.
  // The cross-engine check for both is the DuckDB gate itself.
  private val sqlSkip = Set("g08_degree_histogram", "t13_domain_cap")

  // Oracles written in DuckDB-only dialect (recursive CTEs, `//` integer
  // division, unnest/list_* functions, ::CASTs ...) that Spark cannot
  // parse; their cross-engine check is the DuckDB gate alone. Kept as an
  // EXPLICIT expected set: if an oracle drifts in or out of Spark
  // parsability the parity test FAILS loudly instead of silently
  // shrinking the net (a query whose oracle stops parsing would
  // otherwise drop out with no signal).
  private val sqlUnparsable: Set[String] = Set(
    "d01_exact_dedup", "d02_minhash_lsh", "d03_simhash", "d04_ngram_jaccard",
    "d05_embedding_neardup", "d06_content_sample", "d07_stratified_sample",
    "d08_dup_clusters", "d09_bloom_filter", "d10_importance_sample",
    "d11_incremental_minhash", "d12_decontaminate", "d13_prefix_jaccard",
    "d14_incremental_dedup", "d15_dup_shingle_rate", "d16_containment",
    "d28_band_index_lifecycle", "d30_incremental_dedup_from_index",
    "d31_band_index_delete", "d32_band_versioned_lifecycle",
    "d33_incremental_dedup_versioned", "d34_dedup_time_travel",
    "st17_stream_band_maintenance", // d28's oracle shape (md5 band keys)
    "t23_bpe_versioned_pinned_encode", // t19's oracle shape
    "g30_versioned_degree_state", // g25's oracle shape (`//`, quantile_cont)
    "s15_ivf_delete",
    "s16_ivf_versioned_lifecycle", "s17_ivf_retrain",
    "d26_contamination_pairs", "i01_tolerant_ingest", "i02_quarantine_sink",
    "i04_ingest_circuit_breaker",
    "t18_bpe_train", "t19_bpe_encode", "t20_bpe_run_cert",
    "t21_bpe_fast_train", "e07_bpe_packing",
    "g25_degree_maintenance", "g26_incremental_triangles",
    "g27_incremental_components", "g28_incremental_pagerank",
    "d17_cluster_split", "d18_semantic_clusters", "e01_corpus_build",
    "e02_day_two", "e03_admission_diff", "e05_corpus_diff",
    "e06_corpus_datasheet", "s08_knn_join", "t17_gopher_repetition",
    "t14_perplexity_buckets", "t15_rag_chunks", "t16_bpe_pairs",
    "g05_adjacency", "g06_pagerank", "g07_components", "g11_kcore",
    "g12_link_prediction", "g13_personalized_pagerank",
    "g14_clustering_coefficient", "g15_graph_stats",
    "m01_media_meta", "m02_media_features", "m03_frame_sample", "m04_resize",
    "m08_image_roundtrip", "m09_audio_roundtrip", "m10_gif_roundtrip",
    "m06_phash_neardup", "m07_interleave", "q44_keep_latest",
    "p01_profile", "p03_key_skew", "p06_moments", "p07_quantile_sketch",
    "p08_distinct_sketch", "p09_freq_sketch", "p10_correlation", "p11_drift",
    "p12_sketch_overlap", "p13_mad_outliers", "p14_grouped_distinct",
    "d19_dup_spans", "d27_substring_rewrite", "d29_substring_rewrite_keep_one",
    "d20_semantic_clusters_banded",
    "d23_semantic_representatives", "d24_embedding_decontaminate",
    // r8 additions: recursive-CTE chain (d25), list_* + QUALIFY (s09),
    // DuckDB %-predicates in the band quadrant (st14)
    "d25_semantic_representatives_hostile", "s09_ivf_pq_topk",
    "st14_stream_incremental_dedup", "st15_stream_ingest_breaker",
    // d21 counts tokens with len(string_split(…)); p15/d22 use `//`
    "d21_mixture_weights", "d22_budget_select", "p15_constraint_audit",
    "g16_khop_reach", "g17_hyperball",
    // the skew-gate oracles use DuckDB's integer-division `//`
    "g18_skew_triangles", "g19_skew_common_neighbors",
    "g20_skew_components", "g21_skew_degree_stats",
    "g22_skew_capped_neighbors", "g23_skew_triangles_ordered",
    "g24_skew_sampled_triangles",
    // e04's oracle uses `//` for the round-robin shard position
    "e04_shuffle_shard",
    "q55_string_agg",
    "st13_sketch_registers",
    "q26_percentile", "q28_range_join", "q29_json_extract",
    "q30_approx_quantile", "q31_window_range", "q32_grouping_sets",
    "q37_unpivot", "q38_array_hof", "q45_retention_cohorts",
    "q46_copurchase", "q48_densify", "q49_share", "q50_churn",
    "s01_cosine_topk", "s02_lsh_topk", "s03_lsh_multitable", "s04_quantize_int8",
    "s05_ivf_topk", "s06_quantized_rerank", "s07_pq_adc",
    "s10_ivf_index_lifecycle", "s11_ivf_incremental", "s12_ivf_compaction",
    "s13_ivf_filtered_search", "s14_ivf_index_stats",
    "st16_stream_index_maintenance", "t22_bpe_tokenize",
    "st01_window_hourly", "st02_sessionize", "st03_asof_join",
    "st05_threshold_alert", "st06_window_sliding", "st07_interval_join",
    "st08_funnel", "st10_disorder_audit", "st11_attribution",
    "st12_asof_forward",
    "t01_token_stats", "t02_quality", "t03_langid", "t04_fingerprint",
    "t05_tfidf", "t06_inverted_index", "t07_redact", "t08_vocab_coverage",
    "t09_repetition", "t10_pack_sequences", "t11_unigram_surprisal",
    "t12_collocations")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows") {
      val df = fn(spark, dir)
      assert(df.count() > 0, s"$name returned no rows at sf0.001")
    }
  }

  test("oracle SQL matches DataFrame results under Spark SQL where parsable") {
    Tables.registerAll(spark, dir)
    var failedToParse = Set.empty[String]
    for ((name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1) if !sqlSkip(name)) {
      val viaSql =
        try Some(spark.sql(sql))
        catch { case _: Throwable => failedToParse += name; None }
      viaSql.foreach { sdf =>
        val api = SparkEntry.queries(name)(spark, dir)
        val a = api.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        val b = sdf.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        assert(a.length == b.length, s"$name: row count API=${a.length} SQL=${b.length}")
        assert(a.zip(b).forall { case (x, y) => x == y }, s"$name: value mismatch")
      }
    }
    // exact-set assertion, both directions: a NEW parse failure silently
    // removing a query from the net, or a STALE entry here masking one,
    // both fail with the drift spelled out
    assert(failedToParse === sqlUnparsable,
      s"""parity-net drift:
         |  newly unparsable: ${(failedToParse -- sqlUnparsable).toSeq.sorted.mkString(", ")}
         |  now parsable (remove from sqlUnparsable): ${(sqlUnparsable -- failedToParse).toSeq.sorted.mkString(", ")}""".stripMargin)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("revenue sums on a planted half-cent corpus: exact-decimal HALF_UP, order-independent (fuzz seed 116)") {
    // seed 116 caught q03 rounding a group differently across engines:
    // the exact decimal sum ended in a half-cent and the double
    // accumulation's last ulp decided the cent. The dec2 formulation
    // sums exactly, so the planted boundaries below have ONE correct
    // answer both engines must produce.
    import spark.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("halfcent").toString
    // order 1: single addend 1.25 * 0.90 = 1.1250 -> HALF_UP 1.13
    // order 2: two addends 0.55 * 0.95 = 0.5225 each, sum 1.0450 -> 1.05
    Seq((1L, 1.25, 0.10), (2L, 0.55, 0.05), (2L, 0.55, 0.05))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir2/lineitem.parquet")
    Seq((1L, 10L), (2L, 10L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir2/orders.parquet")
    Seq((10L, "BUILDING")).toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir2/customer.parquet")
    val rev = SparkEntry.queries("q03_join_agg")(spark, dir2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rev === Map(1L -> 1.13, 2L -> 1.05))
  }
}
