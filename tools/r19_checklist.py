#!/usr/bin/env python3
"""Generate the OPTIMIZATION_r19 per-query checklist table from the
baseline and final bench maps."""
import json, sys

base = json.load(open('plans/r19/bench_r19_control_pair.json'))['queries']
fin = json.load(open(sys.argv[1]))['queries']

S = {}
def tag(t, *qs):
    for q in qs: S[q] = t

tag('r19: classifier featurize row-local + bounded train (0590a90)',
    'q114_quality_classifier')
tag('r19: driver-local union-find CC fast path (6396950)',
    'q34_neardup_clusters', 'q104_canonical_picks', 'q106_leakage_safe_split')
tag('r19: tagged single-pass media banding + CC + SHJ (6396950, e76f652)',
    'q121_crossmodal_clusters', 'q47d_corpus_pipeline_xmodal')
tag('r19: row-local repetition fold + classifier train + SHJ',
    'q47_corpus_pipeline', 'q47b_corpus_pipeline_v2', 'q47c_corpus_pipeline_v3')
tag('r19: row-local repetition aggregate fold (6396950)',
    'q38_repetition_signals')
tag('r19: subsample repartition before pair join (6396950)',
    'q116_banding_calibration')
tag('r19: streamed-side repartition before broadcast scoring (6396950)',
    'q99_bitext_margin', 'q99b_bitext_margin_lsh')
tag('r19: deg carried in rank vector; checkpoint every 2nd round (99b23f3, c8098f8)',
    'q103_pagerank')
tag('examined: prefix-filter containment is the algorithm; checkpoint A/B lost '
    '(9.3-9.8 vs 7.0-7.9 s) - recompute kept; SHJ rewrite -3.5 s',
    'q102_containment')
tag('examined: candgen already slim-scalar (PlanAudit); SHJ rewrite -1.3 s',
    'q63_tfidf_cosine_pairs')
tag('left: leased two-producer grow protocol IS the query (r18 verdict); '
    'SHJ trims the probe legs', 'q107c_knn_ivfpq_incremental',
    'q107d_knn_ivfpq_mixed_grow', 'q82c_bm25_mixed_grow')
tag('left: exact count_distinct fidelity choice; approx swap documented '
    'for 100 TB (Profile scaladoc)', 'q56_profile')
tag('left: DECIMAL accumulation is the cross-engine hash discipline',
    'q04_pricing_summary', 'q05_join_star')
tag('examined: zero-shuffle aggregate folds already; cost is row-local',
    'q122_intradoc_dedup', 'q113_line_dedup')
tag('examined: Lloyd loop is scan+slim-agg per iter; job-count bound',
    'q86_kmeans', 'q93_cluster_profile')
tag('examined: memoized LM + broadcast model joins already (r15); '
    'settle protects the cross-query artifact',
    'q67_perplexity', 'q68_perplexity_bands', 'q70_ppl_cut_gate')
tag('left: build-once artifacts amortized by design; gate recomputes '
    'the exact twin per rep (the declared gate)', 'q85c_hybrid_rrf_ann',
    'q85b_hybrid_rrf_indexed', 'q107b_knn_ivfpq_indexed', 'q82b_bm25_indexed')

DEFAULT = ('swept: PlanSweep r19 clean (no sort-agg fallback, no accidental '
           'nested loop, exchanges as designed); improvements ride the '
           'session-wide SHJ rewrite')

rows = sorted(base.keys())
print('| query | baseline s | final s | Δ | status |')
print('|---|---|---|---|---|')
for q in rows:
    b, f = base[q], fin.get(q, float('nan'))
    d = f - b
    print(f'| {q} | {b:.2f} | {f:.2f} | {d:+.2f} | {S.get(q, DEFAULT)} |')
tb, tf = sum(base.values()), sum(fin.values())
print(f'\nTotals: {tb:.1f} -> {tf:.1f} s ({(tf-tb)/tb*100:+.1f}%)')
