package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline query set
  * against SPARK_GRAFT_SF_DIR on local[SPARK_GRAFT_CPUS] and prints
  * ONE JSON line with per-query seconds.
  *
  * Headline set = one representative per operator family, excluding
  * redundant variants (l2-l4 rebuild the same table l1 builds; p2/p5
  * are the exact verifiers of the scale paths p3/p6 and are
  * quadratic by design — correctness-gated, not raced).
  *
  * Each query runs SPARK_GRAFT_BENCH_RUNS times (default 3) and the
  * reported number is the MIN across runs; per-run values ship in a
  * "runs" field. A single cold run on a shared host is dominated by
  * scheduler noise and one-time costs (e.g. p14's persisted-IVF
  * index build: the first run builds, later runs probe), so the min
  * is the reproducible figure — two invocations at different scales
  * both report the warm-path time, keeping scale ratios comparable.
  * The l-family is not advantaged by this: every run rebuilds its
  * table in a fresh temp dir, so each run repeats the full write
  * pipeline.
  */
object Bench {

  private val headline = Seq(
    // analytics surface (§2.2-2.5)
    "q1_pricing_summary", "q2_group_max_having", "q3_proj_filter",
    "q4_range_filter", "q5_join_agg", "q6_latest_per_key",
    "q7_count", "q8_dup_check",
    "q19_window_analytics", // round 6: analytic-window family
    "q23_percentiles", "q24_corr_moments", // round 10: order-statistic + moment families
    // lakehouse write/read pipeline (§2.1, §2.6, §2.9)
    "l1_cow_upsert_snapshot", "l5_incremental",
    "l14_mor_catalog_snapshot",
    "l17_stream_sink", // round 8: streaming source→sink ETL round trip
    "l19_spj_join", // round 11: zero-exchange storage-partitioned join
    "l20_incremental_mv", // round 11: CDC-retraction MV refresh
    // training-data pipeline (north star)
    "p1_dedup_exact", "p3_dedup_minhash_lsh", "p6_ann_brute_topk",
    "p7_ann_lsh_topk", "p14_ann_ivf_topk",
    "p8_text_quality", "p11_token_count",
    "p23_dedup_keep_best", // round 6: full cluster+canonicalize pipeline
    "p26_bpe_merges", // round 8: BPE merge loop (corpus-once + vocab rounds)
    "p28_bpe_encode", // round 10: tokenizer apply (learn + one map-only corpus pass)
    "p29_curation_pipeline", // round 10: composed filter→dedup→keep-best pipeline
    "p30_lm_typicality", // round 10: bigram-LM scoring via salted skew joins
    "p32_line_dedup", // round 11: cross-doc boilerplate removal
    "p33_chunking", // round 11: map-only sliding-window chunking
    "p34_quality_classifier", // round 11: model-scored filtering
    "p35_oov_rate", // round 11: vocab-coverage metric
    "p36_tf_cosine", // round 12: weighted all-pairs similarity
    "l24_merge_full_sync", // round 13: MERGE with NOT MATCHED BY SOURCE
    "p40_containment", // round 13: asymmetric shingle-containment dedup
    "p42_hashed_classifier", // round 13: hashing-trick n-gram classifier
    "q43_funnel", // round 14: ordered-sequence funnel (one user exchange)
    "q46_multi_join", // round 14: TPC-H Q5 six-table star join
    "l25_partial_upsert", // round 14: partial-update payload write path
    "p47_knn_label", // round 14: broadcast-seed kNN labeling
    "p48_heavy_hitters", // round 14: exact frequent-bigram mining
    "l30_derived_partitions", // round 17: TimestampBasedKeyGenerator write+merge
    "p55_shared_spans", // round 17: exact verbatim-span dedup (ExactSubstr family)
    "p56_dsir_select", // round 18: DSIR hashed n-gram importance resampling
    "p57_ppl_buckets", // round 18: CCNet-style perplexity head/middle/tail split
    "p58_bm25_topk", // round 18: posting-list BM25 retrieval
    "p59_weighted_sample", // round 18: ES weighted sampling (map + TakeOrdered)
    "p60_bloom_decontaminate", // round 19: map-only Bloom-probe decontamination
    "p63_kn_perplexity", // round 19: corpus-fit KN bigram LM scoring
    "p64_ivfpq_adc", // round 19: build+query the composed IVF-PQ index
    "p67_domain_cap", // round 20: URL canonicalization + per-domain caps
    "p71_web_pipeline", // round 21: composed canonicalize→cap→decontaminate→split chain
    "p72_interleaved_assembly", // round 23: multimodal sample assembly (one doc_id shuffle)
    "p73_full_chain", // round 23: the WHOLE RefinedWeb pipeline, front+back composed
    "p74_exact_substr_excise", // round 24: keep-first duplicated-span cutting
    "l34_delta_checkpoint", // round 24: export → checkpoint → expire → foreign mount
    "p75_unigram_encode", // round 24: unigram-LM Viterbi tokenizer encode
    "p76_gopher_rules", // round 24: the full Gopher decision battery, map-only
    "p77_tokenizer_pipeline", // round 24: gopher → excise → unigram, composed
    "p78_mmr_select", // round 24: greedy MMR diversity selection, k TakeOrdered scans
    "p79_balanced_shards", // round 24: salted snake deal onto equal-token shards
    "p80_perceptron", // round 24: integer batch-perceptron training, 3 epochs
    "p81_ann_query_set", // round 25: 20-query IVF-PQ retrieval, one codes pass
    "p82_unigram_frozen", // round 25: frozen-vocab streaming-shape unigram encode
    "l35_table_dedup", // round 25: in-table exact-dedup curation service
    "p83_mixture_weights", // round 25: temperature source-mixing budget table
    "l36_table_dedup_fuzzy", // round 25: in-table MinHash near-dup curation
    "p84_ann_filtered", // round 26: metadata-filtered query-set ANN (id-set path)
    "p85_mmr_clustered", // round 26: pool-collect scalable MMR
    "p86_ann_filtered_stored", // round 26: stored-column filtered ANN (pushdown path)
    "l37_vector_search") // round 26: CALL vector_search over the table-service index

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nRuns = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = Session.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb JVM/session startup before timing
    spark.range(1000).selectExpr("sum(id)").collect()

    val qs = SparkEntry.queries
    // local-iteration filter (the driver never sets it): run only the
    // named headline queries, e.g. SPARK_GRAFT_BENCH_ONLY=p36_tf_cosine
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').toSet)
    def once(name: String): Double = {
      // isolate runs: drop any cache a previous query/run left behind
      // and give the context cleaner a chance to drain its backlog —
      // leftover heap state was measured adding 2-6× tail latency to
      // later queries at the 100× scale point
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val n = try qs(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L
      }
      val dt = (System.nanoTime() - t0) / 1e9
      if (n < 0) -1.0 else dt
    }
    // host-speed sentinel: a fixed CPU-bound job, independent of sfDir
    // and of any engine code path, timed the same way the queries are.
    // Two consecutive driver sweeps have twice flagged 20-35% phantom
    // "regressions" on unchanged sub-second queries that targeted
    // quiet-host re-runs put back at historical bests — the shared
    // host drifts. Dividing each query by the SAME sweep's sentinel
    // separates code changes from host drift in one glance.
    def sentinelOnce(): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      spark.range(0L, 2000000000L, 1L, cpus)
        .selectExpr("sum(xxhash64(id * 2654435761))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val sentinelBefore = (1 to 3).map(_ => sentinelOnce()).min
    val results = headline.filter(qs.contains)
      .filter(n => only.forall(_.contains(n))).map { name =>
      val runs = (1 to nRuns).map(_ => once(name))
      // sub-second entries are the ones scheduler noise swamps (the
      // phantom-regression band is exactly here): extend to min-of-5
      val extended =
        if (runs.forall(_ >= 0) && runs.min < 1.0 && nRuns < 5)
          runs ++ (nRuns until 5).map(_ => once(name))
        else runs
      name -> extended
    }
    val sentinelAfter = (1 to 3).map(_ => sentinelOnce()).min
    val sentinel = math.min(sentinelBefore, sentinelAfter)
    def f3(v: Double) = f"$v%.3f"
    // compact value rendering for the stdout line: 2 decimals, trailing
    // zeros trimmed ("0.35", "1.7", "12") — valid JSON numbers, and the
    // 72-query line stays under the harness' ~2KB output-tail capture
    def fc(v: Double): String = {
      val s = f"$v%.2f"
      if (!s.contains('.')) s
      else {
        val t = s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
        if (t.isEmpty || t == "-") "0" else t
      }
    }
    val best = results.map { case (k, rs) =>
      k -> (if (rs.exists(_ < 0)) -1.0 else rs.min)
    }
    val qJson = best.map { case (k, v) => "\"" + k + "\":" + fc(v) }
      .mkString("{", ",", "}")
    val runsJson = results.map { case (k, rs) =>
      "\"" + k + "\":" + rs.map(f3).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = best.map(_._2).filter(_ >= 0).sum
    // A -1 benchmark is a crashed query, not a fast one. Stamp the JSON
    // with the failed list so the headline total is visibly partial
    // (round-9 lesson: four -1s read as a 2× "speedup"), and exit
    // non-zero so the harness records the run as failed.
    val failed = best.collect { case (k, v) if v < 0 => k }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // normalized = best ÷ sentinel (host-speed units): compare THESE
    // across rounds to separate code changes from host drift
    val normJson = best.map { case (k, v) =>
      "\"" + k + "\":" + (if (v < 0) "-1.0" else f3(v / sentinel))
    }.mkString("{", ",", "}")
    // Full-precision detail record (per-run values + normalized map) on
    // STDERR: the harness captures only the last ~2000 chars of output,
    // and this record is ~9KB — printed on stdout it truncated mid-JSON
    // and the whole bench line parsed as null from round 15 through 18.
    // The queries/methodology are unchanged; only where each field is
    // printed moved.
    System.err.println(f"""{"metric":"total_detail","value":$total%.3f,"unit":"sec","runs":$runsJson,"sentinel":${f3(sentinel)},"normalized":$normJson,"failed":$failedJson,"sf":"$sfDir"}""")
    // Stop the session BEFORE the contract line: spark.stop() can emit
    // shutdown warnings, and in a merged stdout+stderr capture those
    // would land after the line and eat into the ~2KB tail window.
    spark.stop()
    // The driver-contract line: ONE compact JSON line, printed LAST on
    // stdout, small enough to survive the output-tail capture whole.
    println(f"""{"metric":"total","value":${fc(total)},"unit":"sec","queries":$qJson,"sentinel":${f3(sentinel)},"failed":$failedJson,"sf":"$sfDir"}""")
    if (failed.nonEmpty) sys.exit(1)
  }
}
