"""Benchmark harness — prints ONE JSON line.

Runs (a) the frontier scheduler (the engine's headline metric:
URLs scheduled+deduped/sec) and (b) the headline analytical queries,
at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32).

Output shape:
  {"metric": "bench_total", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": "...",
   "frontier_urls_per_sec": N, "frontier_urls_scheduled": N}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Headline subset of the registry (scan/agg/join + training-data ops).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "d3_daily_rate_limit",
    "t4_topk_per_group",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_bruteforce_topk",
    "sim_embedding_near_dups",
    "p1_extract_fields",
    "text_lang_id",
    "text_quality_score",
    # round-3 additions (comparable from BENCH_r03 on)
    "dedup_lines_c4",
    "split_neardup_contamination",
    "j_asof_prior_view",
    "text_curation_funnel",
    "text_pii_redact",
    "rank_pagerank",
    # round-3 session-2 additions
    "dedup_substring_coverage",
    "text_model_quality",
    "export_shard_plan",
    # round-3 session-3 additions
    "text_gopher_rules",
    "rank_trap_patterns",
    "d6_adaptive_revisit",
    "pack_sequences",
    "text_lm_perplexity",
    "text_inverted_index",
    "text_vocab_oov",
    "text_curation_funnel_full",
    # round-4 additions (comparable from BENCH_r04 on)
    "text_dsir_weights",
    "mix_source_weights",
    "budget_maxmin_fair",
    "split_ngram_overlap_contamination",
    "media_phash_dedup",
    "select_token_budget",
    "text_ccnet_ppl_buckets",
    "tok_bpe_pair_counts",
    "text_zipf_heaps",
    "select_dsir_resample",
    "export_warc_offsets",
    "export_zorder_layout",
    "rank_hits",
    # round-4 session-4 additions (comparable from BENCH_r04 on)
    "rank_redirect_resolve",
    "dedup_dust_rules",
    "src_cdx_parse",
    "rank_trustrank",
    "text_c4_line_filters",
    "tok_bpe_train",
    "sim_kmeans_relational",
    "a_hll_registers",
    "rank_param_entropy",
    "a_fetch_anomaly_zscore",
    "d8_adaptive_crawl_delay",
    "dedup_keep_best",
    "text_lang_segments",
    # round-4 session-5 additions (comparable from BENCH_r04 on)
    "text_boilerplate_lines",
    "text_pmi_collocations",
    "sim_int8_quantize",
    "rank_opic",
    "quality_calibration_ece",
    "d9_conditional_get",
    "rank_reciprocity",
    "a_corpus_churn",
    "text_filter_ablation",
    "tok_vocab_coverage",
    "a_gini_host_concentration",
    "export_checksum_manifest",
    # round-4 session-6 additions (comparable from BENCH_r04 on)
    "url_registrable_domain",
    "dedup_ngram_containment",
    "text_passage_chunks",
    "text_script_profile",
    "quality_compression_ratio",
    "search_bm25_topk",
    "rank_seed_distance",
    "url_resolve_relative",
    "url_outlink_resolve",
    "pipeline_robots_sitemap_discovery",
    "shard_rendezvous_assign",
    "text_token_entropy",
    "warc_revisit_records",
    "sample_weighted_ares",
    # round-4 session-7 additions (comparable from BENCH_r04 on)
    # (search_lexical_cosine is registry-only: at its registered
    # max_df_frac=0.85 on the synthetic ~31-term vocabulary the exact
    # posting-list self-join is deliberately unpruned — ~231 s at
    # sf0.1 — the same "exact verifier, not the scale path" status as
    # the demoted crossJoin twins; production df caps are pinned by
    # tests/test_lexical_cosine.py)
    "url_idn_hosts",
    # round-4 session-8 additions (comparable from BENCH_r04 on)
    "d10_priority_aging",
    "quality_model_auc",
    "export_stride_interleave",
    "src_cache_policy",
    "text_mojibake_signals",
    # round-4 session-9 additions (comparable from BENCH_r04 on)
    "media_mp4_sample_plan",
    "media_audio_spectral",
    "rank_lpa_communities",
    "dedup_edit1_pairs",
    "sim_embedding_covariance",
    "sim_pca_whiten_identity",
    "text_main_content",
    "dedup_source_overlap",
    "media_mime_sniff",
    "export_frontcoded_urls",
    "dedup_incremental_minhash",
    "sim_random_projection",
    "quality_logreg_train",
    "rank_triangle_stats",
    # round-4 session-10 additions
    "rank_kcore",
    "text_readability",
    "rank_hyperball",
    "search_phrase",
    "dedup_winnow",
    "a_hll_merge_shards",
    "dedup_winnow_matches",
    "rank_scc_certificates",
    "media_exif_metadata",
    "dedup_cdc_chunks",
    "dedup_winnow_spans",
    "sim_pq_adc",
    "export_bloom_words",
    "text_kn_bigram_ppl",
    "d11_retry_backoff",
    "a_jain_fairness",
    "sim_ivfpq_topk",
    "url_canonical_alias",
    "d12_ucb_host_allocation",
    "text_source_kl",
    "dedup_suffix_array",
    "dedup_suffix_lcp",
    "tok_unigram_train",
    "text_mattr_diversity",
    # round-5 additions (comparable from BENCH_r05 on)
    "dedup_suffix_coverage",
]

BENCH_ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))


def force(df) -> int:
    """Fully execute a plan without driver-side collect."""
    return df.write.format("noop").mode("overwrite").save() or 0


def bench_frontier(spark, sf_dir: str) -> dict:
    """Time BENCH_ROUNDS scheduler rounds with politeness caps opened
    up (the caps measure manners, not throughput)."""
    from pyppeteer_scraper_spark.plans.checkpoint import crawl
    from pyppeteer_scraper_spark.sources.datagen import (
        generate_pages,
        generate_robots,
        generate_seeds,
    )

    documents = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_base = documents.count()
    # Replicate the URL universe so per-round parallelizable work
    # (canonicalize/extract/join over ~10^5 pages) dominates fixed
    # per-job overhead — the regime a real cluster runs in.
    rep = int(os.environ.get("SPARK_GRAFT_BENCH_REP", "20"))
    docs_rep = documents.crossJoin(
        spark.range(rep).select(F.col("id").alias("rep"))
    ).select(
        (F.col("doc_id") + F.col("rep") * n_base).alias("doc_id"), "text", "lang"
    )
    n_docs = n_base * rep
    pages = generate_pages(docs_rep, n_docs)
    # Large seed set + open politeness caps: measure scheduling
    # throughput, not manners.
    seeds = generate_seeds(docs_rep, n_docs, n_seeds=max(50, n_docs // 2))
    cap = 1_000_000_000
    # Delays zeroed for the same reason the caps are opened: a binding
    # crawl_delay turns the benchmark into a manners test (the 100 ms
    # default is a 600-URL/round budget; the mega-host's 1 s is 60).
    robots = generate_robots(
        pages, mega_cap=cap, default_cap=cap, parity_cap=cap,
        mega_delay_ms=0, default_delay_ms=0,
    )

    ckpt = tempfile.mkdtemp(prefix="bench_ckpt_")
    try:
        t0 = time.time()
        # async_checkpoint: the shipping configuration — writes overlap
        # the next round's compute; results proven identical
        # (tests/test_async_checkpoint.py, BENCH/BASELINE.md §2f A/B).
        result = crawl(
            spark, pages, seeds, robots, BENCH_ROUNDS, ckpt,
            async_checkpoint=True,
        )
        elapsed = time.time() - t0
        scheduled = result.state.url_seen.count()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "frontier_seconds": round(elapsed, 3),
        "frontier_rounds": BENCH_ROUNDS,
        "frontier_universe_pages": n_docs,
        "frontier_urls_scheduled": scheduled,
        "frontier_urls_per_sec": round(scheduled / elapsed, 2),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyppeteer_scraper_spark.session import get_spark

    spark = get_spark("bench", cores=cpus)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries = mod.queries()

    # Warm up the session (JVM/codegen/Python-worker spin-up) so the
    # first timed query isn't charged for it.
    force(queries["q6_forecast_revenue"](spark, sf_dir))

    t_total = time.time()
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        force(fn(spark, sf_dir))
        per_query[name] = round(time.time() - t0, 3)

    frontier = bench_frontier(spark, sf_dir)
    total = round(time.time() - t_total, 3)

    # ARTIFACT ROBUSTNESS (VERDICT r04 "What's wrong #2"): the driver
    # keeps only a bounded TAIL of this process's output, and r04's
    # 124-query stdout dict overflowed it — "parsed": null.  Round 5:
    # the full per-query detail goes to a committed file; the stdout
    # line stays compact (summary stats + a representative subset) and
    # is printed LAST, after spark.stop(), so no Spark shutdown noise
    # can land after it.
    detail_path = os.path.join(REPO, "BENCH", "bench_detail_latest.json")
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf_dir,
                "cpus": cpus,
                **frontier,
            },
            fh,
            indent=1,
            sort_keys=True,
        )

    # Representative stdout subset: the headline scan/agg/join quartet
    # plus the most expensive operator families (dedup, similarity,
    # graph, tokenizer, curation) — every name comparable across
    # BENCH_r03+ artifacts.
    stdout_subset = [
        "q1_pricing_summary",
        "q6_forecast_revenue",
        "d3_daily_rate_limit",
        "t4_topk_per_group",
        "dedup_exact_groups",
        "dedup_minhash_lsh",
        "sim_embedding_near_dups",
        "sim_bruteforce_topk",
        "text_lang_id",
        "text_curation_funnel_full",
        "rank_pagerank",
        "pack_sequences",
        "dedup_substring_coverage",
        "dedup_suffix_array",
        "dedup_suffix_lcp",
        "dedup_suffix_coverage",
        "dedup_ngram_containment",
        "rank_hyperball",
        "rank_hits",
        "text_kn_bigram_ppl",
        "sim_ivfpq_topk",
        "url_canonical_alias",
        "tok_bpe_pair_counts",
        "tok_unigram_train",
        "text_dsir_weights",
        "media_mp4_sample_plan",
        "search_bm25_topk",
        "d12_ucb_host_allocation",
    ]
    slowest = sorted(per_query, key=per_query.get, reverse=True)[:5]
    compact = {
        n: per_query[n]
        for n in dict.fromkeys(stdout_subset + slowest)
        if n in per_query
    }
    out = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": compact,
        "n_queries": len(per_query),
        "queries_detail_file": os.path.relpath(detail_path, REPO),
        "sf": sf_dir,
        "cpus": cpus,
        **frontier,
    }
    spark.stop()
    sys.stdout.flush()
    sys.stderr.flush()
    line = json.dumps(out, separators=(",", ":"))
    print(line, flush=True)


if __name__ == "__main__":
    main()
