#!/usr/bin/env python3
"""Render SURVEY round-bench-notes rows from BENCH_LOCAL.json (the last
full-suite fork run) against the r9/r8 driver reference points, so the
quoted notes can only ever come from the committed artifact."""
import json, sys

cur = json.load(open('BENCH_LOCAL.json'))
R9MED = {'p70_inverted_index': 1.446, 'p69_bigram_perplexity': 2.089,
         'q01_pricing_summary': 0.997, 'p56_pretrain_pipeline': 2.704,
         'p47_funnel': 0.604, 'p51_pmi_pairs': 1.386}
R9MIN = {'p02_minhash_lsh_dedup': 1.430, 'p16_simhash_neardup': 1.416,
         'p19_duplicate_clusters': 2.906, 'w03_zorder_rewrite': 1.957,
         'p70_inverted_index': 0.656, 'p69_bigram_perplexity': 1.920,
         'q01_pricing_summary': 0.825, 'p44_unigram_perplexity': 0.640,
         'p27_semantic_dedup': 1.103, 'p56_pretrain_pipeline': 2.460}

rows, tot = [], 0.0
for k in sorted(cur['queries']):
    m, mn = cur['queries'][k], cur['queries_min'][k]
    tot += m
    notes = []
    if k in R9MED:
        notes.append(f"{m / R9MED[k]:.2f}x of r9 driver med")
    if k in R9MIN:
        notes.append(f"{mn / R9MIN[k]:.2f}x of r9 driver min")
    rows.append(f"| {k} | {m:.3f} | {mn:.3f} | {'; '.join(notes)} |")
print("| query | med s | min s | vs r9 driver |")
print("|---|---|---|---|")
print("\n".join(rows))
print(f"\ntotal med {tot:.2f} s over {len(cur['queries'])} queries "
      f"(r9 had 26; w07_index_serving is new)")
