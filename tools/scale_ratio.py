#!/usr/bin/env python3
"""Scale-curve ratio gate (r15 verdict item 2): join two bench epochs at
different scale factors and flag any query whose time grew super-linearly.

The r15 scale audit found q_knn_eval's quadratic plan (1.5 s at sf1 ->
75 s at sf10) by hand-computing exactly this table; this tool makes the
check mechanical so the next super-linear plan is caught the round it
lands, not rounds later.

Usage:
  python3 tools/scale_ratio.py BASE.json SCALED.json \
      [--factor 10] [--threshold 12] [--floor 3.0] \
      [--annotations tools/scale_annotations.json] [--out report.md]

BASE/SCALED are Bench.scala artifacts ({"queries": {name: sec}}) or the
driver wrapper ({"parsed": {...}}). `--factor` is the data-size ratio
between the two epochs (10 for sf1 -> sf10). `--threshold` is the max
allowed time ratio (default 12 = factor * 1.2 headroom for shuffle
growth). Rows whose SCALED time is under `--floor` seconds are skipped:
sub-noise scans carry single-iteration IO spikes at ITERS=2 (r15: 6-7x
swings on q_unpivot/q_text_stats between epochs) and cannot prove shape.

Annotations file: {"query": "explanation", ...} or, per the sf10 epoch
spike protocol (r15 verdict item 3), {"query": {"solo_min_s": 2.1,
"note": "interference — solo ProfileQuery steady"}}: any epoch row that
trips the gate gets ONE solo ProfileQuery re-run and the sidecar records
both numbers, so the pinned artifact never contradicts its own solo
measurement. A flagged query with an annotation prints EXPLAINED and
does not fail the gate; a flagged query WITHOUT one fails the gate
(exit 1). Keep the sidecar next to the epoch it annotates
(tools/bench_baselines/bench_rN_sf10.annotations.json).
"""
import argparse, json, re, sys


def load(path):
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc["queries"]
    if isinstance(doc, dict) and doc.get("parsed"):
        return doc["parsed"]["queries"]
    tail = doc.get("tail", "")
    m = re.search(r'\{"metric":.*\}', tail)
    if m:
        return json.loads(m.group(0))["queries"]
    raise SystemExit(f"{path}: no bench queries found")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("scaled")
    ap.add_argument("--factor", type=float, default=10.0)
    ap.add_argument("--threshold", type=float, default=12.0)
    ap.add_argument("--floor", type=float, default=3.0)
    ap.add_argument("--annotations", default=None)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()

    base, scaled = load(a.base), load(a.scaled)
    notes = {}
    if a.annotations:
        with open(a.annotations) as f:
            notes = json.load(f)

    shared = sorted(set(base) & set(scaled))
    rows, n_flag, n_expl, n_skip = [], 0, 0, 0
    for q in shared:
        b, s = base[q], scaled[q]
        if s < a.floor:
            n_skip += 1
            continue
        ratio = s / b if b > 0 else float("inf")
        if ratio <= a.threshold:
            verdict = "ok"
        elif q in notes:
            note = notes[q]
            if isinstance(note, dict):
                solo = note.get("solo_min_s")
                note = (f"solo {solo:g}s — " if solo is not None else "") \
                    + note.get("note", "")
            verdict = f"EXPLAINED: {note}"
            n_expl += 1
        else:
            verdict = "FLAG"
            n_flag += 1
        rows.append((ratio, q, b, s, verdict))
    rows.sort(reverse=True)

    lines = [
        f"# Scale ratio report: {a.base} -> {a.scaled} "
        f"(data x{a.factor:g}, threshold {a.threshold:g}x, floor {a.floor:g}s)",
        "",
        "| query | base_s | scaled_s | ratio | verdict |",
        "|---|---|---|---|---|",
    ]
    for ratio, q, b, s, verdict in rows:
        lines.append(f"| {q} | {b:.2f} | {s:.2f} | {ratio:.1f}x | {verdict} |")
    lines.append("")
    lines.append(
        f"{len(shared)} shared queries; {n_skip} under the {a.floor:g}s floor; "
        f"{n_flag} unexplained FLAG, {n_expl} explained."
    )
    report = "\n".join(lines)
    print(report)
    if a.out:
        with open(a.out, "w") as f:
            f.write(report + "\n")
    if n_flag:
        print(f"\nGATE FAIL: {n_flag} super-linear quer"
              f"{'y' if n_flag == 1 else 'ies'} with no annotation.",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
