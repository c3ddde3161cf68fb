#!/usr/bin/env python3
"""Render SURVEY round-bench-notes rows from BENCH_RUNS_r11.json (the
aggregated sealing-run distribution, tools/bench_runs.sh) against the r10
driver reference points — VERDICT r10 item 4: per-query claims are
phrased as RANGES across >=5 fork runs, never a single run."""
import json, sys

runs = json.load(open(sys.argv[1] if len(sys.argv) > 1 else 'BENCH_RUNS_r11.json'))

# driver BENCH_r10.json minima (complete) + medians (where the driver's
# 2000-char tail preserved them)
R10MIN = {'i01_iceberg_full_scan': 0.962, 'i02_iceberg_pruned_scan': 0.422,
          'i11_dsv2_filter_pushdown': 0.242, 'p02_minhash_lsh_dedup': 1.748,
          'p04_knn_bruteforce': 0.418, 'p13_sessionize': 0.682,
          'p16_simhash_neardup': 1.805, 'p19_duplicate_clusters': 1.813,
          'p21_decontamination': 0.933, 'p27_semantic_dedup': 1.082,
          'p34_asof_join': 0.476, 'p38_kmeans_clusters': 0.778,
          'p44_unigram_perplexity': 0.478, 'p45_dup_spans': 1.534,
          'p47_funnel': 0.513, 'p51_pmi_pairs': 1.415,
          'p56_pretrain_pipeline': 2.471, 'p69_bigram_perplexity': 1.355,
          'p70_inverted_index': 0.398, 'q01_pricing_summary': 0.710,
          'q02_filter_pushdown': 0.291, 'q03_join_revenue': 0.468,
          'w01_cow_delete': 1.389, 'w02_mor_merge': 1.147,
          'w03_zorder_rewrite': 1.960, 'w04_posdelete_rewrite': 1.006,
          'w07_index_serving': 1.051}
R10MED = {'p56_pretrain_pipeline': 2.643, 'p69_bigram_perplexity': 1.444,
          'p70_inverted_index': 0.464, 'q01_pricing_summary': 0.724,
          'q02_filter_pushdown': 0.320, 'q03_join_revenue': 0.504,
          'w01_cow_delete': 1.416, 'w02_mor_merge': 1.209,
          'w03_zorder_rewrite': 2.044, 'w04_posdelete_rewrite': 1.129,
          'w07_index_serving': 1.070}

rows = []
for q in sorted(runs['queries']):
    a = runs['queries'][q]
    lo, hi, med = a['min'], a['max'], a['med']
    notes = []
    if q in R10MIN:
        r = R10MIN[q]
        if hi < r:
            notes.append(f"range {lo/r:.2f}-{hi/r:.2f}x of r10 driver min, all under")
        elif lo > r:
            notes.append(f"range {lo/r:.2f}-{hi/r:.2f}x of r10 driver min, all over")
        else:
            notes.append(f"range {lo/r:.2f}-{hi/r:.2f}x of r10 driver min, straddles")
    if q in R10MED:
        notes.append(f"med {med/R10MED[q]:.2f}x of r10 driver med")
    rows.append(f"| {q} | {med:.3f} | {lo:.3f}-{hi:.3f} | {'; '.join(notes)} |")

print(f"n_runs={runs['n_runs']}  totals (per-run sum of medians): "
      f"{runs['totals_med']}")
print()
print("| query | med-of-runs s | range s | vs r10 driver |")
print("|---|---|---|---|")
print("\n".join(rows))
