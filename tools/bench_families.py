#!/usr/bin/env python3
"""Family-bucketed scale-ratio table from two bench_full records.

Usage: bench_families.py <base.json> <scaled.json> [scale_label]

Buckets every query in BOTH records into an operator family and prints a
markdown table of per-family summed medians, the scaled/base ratio, and
the family's worst-scaling query — the format of SCALE.md's probe
sections. Queries present in only one record are listed separately so a
partial probe can't silently masquerade as full coverage.
"""
import json
import sys

FAMILIES = {
    "streaming": ["q_stream_"],
    "ML training": ["q_rf_", "q_gbt_", "q_model_select", "q_string_index",
                    "q_quality_classifier", "q_knn_eval"],
    "graph/iterative": ["q_pagerank", "q_khop_bfs", "q_triangle_count",
                        "q_label_prop", "q_minhash_det_transitive",
                        "q_dedup_clusters", "q_neardup_survivor"],
    "ANN/similarity": ["q_ann_", "q_cosine_", "q_jaccard_sim", "q_knn_",
                       "q_quantize_emb", "q_rand_proj", "q_label_centroids",
                       "q_contrastive_mine", "q_entity_match"],
    "sketches": ["q_countmin", "q_bloom", "q_hll_", "q_topk_freq",
                 "q_quantile_sketch", "q_sketch_agg"],
    "multimodal": ["q_image_", "q_audio_", "q_video_", "q_frame_sample",
                   "q_multimodal_"],
    "dedup (one-pass)": ["q_exact_dedup", "q_fingerprint_dedup",
                         "q_passage_dedup", "q_incremental_dedup",
                         "q_minhash_dedup", "q_minhash_det_dedup",
                         "q_simhash_", "q_url_"],
}
DEFAULT = "relational / ETL / text"


def family(name: str) -> str:
    # ML names take precedence over prefix-overlapping families
    for fam, pats in FAMILIES.items():
        for p in pats:
            if name.startswith(p) or name == p.rstrip("_"):
                return fam
    return DEFAULT


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d["queries"]


def main(base_path, scaled_path, label="scaled"):
    base, scaled = load(base_path), load(scaled_path)
    shared = sorted(set(base) & set(scaled))
    only = sorted(set(base) ^ set(scaled))
    rows = {}
    for n in shared:
        f = family(n)
        b, s = base[n], scaled[n]
        agg = rows.setdefault(f, {"n": 0, "b": 0.0, "s": 0.0, "worst": (0.0, "")})
        agg["n"] += 1
        agg["b"] += b
        agg["s"] += s
        r = s / b if b > 0 else float("inf")
        if r > agg["worst"][0]:
            agg["worst"] = (r, n)
    print(f"| family | n | base s | {label} s | ratio | worst (ratio) |")
    print("|---|---|---|---|---|---|")
    order = list(FAMILIES) + [DEFAULT]
    tb = ts = 0.0
    for f in order:
        if f not in rows:
            continue
        a = rows[f]
        tb += a["b"]
        ts += a["s"]
        wr, wn = a["worst"]
        # ADVICE r9: guard zero-base sums like the per-query ratios, with
        # one convention everywhere (inf for zero base).
        fr = a["s"] / a["b"] if a["b"] > 0 else float("inf")
        print(f"| {f} | {a['n']} | {a['b']:.1f} | {a['s']:.1f} | "
              f"**{fr:.1f}** | {wn} {wr:.1f} |")
    tr = ts / tb if tb > 0 else float("inf")
    print(f"| **whole registry** | {len(shared)} | {tb:.1f} | {ts:.1f} | "
          f"**{tr:.1f}** | — |")
    if only:
        print(f"\nNOT in both records ({len(only)}): {', '.join(only)}")
    worst = sorted(((scaled[n] / base[n] if base[n] > 0 else float("inf"), n)
                    for n in shared), reverse=True)[:12]
    print("\nTop individual ratios:")
    for r, n in worst:
        print(f"  {n:32s} {base[n]:7.2f} -> {scaled[n]:8.2f}  ({r:.1f}x)")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "scaled")
