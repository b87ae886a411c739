"""Scale-slope report: compare a bench JSON's base timings against
its synthesized-sf1 section (or any two bench JSONs) and classify
each query's growth.

The point of the synthesized 10x dataset (tools/synth_scale.py) is a
data-size DERIVATIVE per query, not another single point: a query
growing ~10x is data-bound and healthy; far below that is
overhead-bound at this scale; far ABOVE is superlinear — a candidate
scale bug (unless it is a documented quadratic baseline like
sim_knn_bruteforce). This tool turns the two timing dicts into that
classification so a round's verdict can read it directly.

Usage:
    python tools/scale_report.py BENCH.json              # base vs sf1_synth
    python tools/scale_report.py BENCH.json sf10_synth   # base vs sf10
    python tools/scale_report.py A.json B.json           # A base vs B base
"""

from __future__ import annotations

import json
import sys

# ratio thresholds SCALE WITH the data step (r6 ADVICE: hardcoded
# 10x-step constants silently misclassified any other ratio):
# superlinear = 1.2x the step, data-bound = 0.6x the step.
SUPERLINEAR_FACTOR = 1.2   # ratio > step*this: candidate scale bug
DATA_BOUND_FACTOR = 0.6    # ratio >= step*this: tracks data size
# below the data-bound cut: overhead-bound at this scale

# documented quadratic-by-construction baselines (SURVEY §6): their
# superlinear slope is expected, not a bug. dedup_embedding_lsh is
# the FIXED-geometry banding kept for small-corpus recall — its
# scale sibling dedup_embedding_lsh_auto re-bands above 10k vectors
# (the side-by-side slope in the same bench is the evidence).
KNOWN_QUADRATIC = {"sim_knn_bruteforce", "dedup_embedding_cosine",
                   "dedup_ngram_jaccard", "dedup_embedding_lsh",
                   # r10: the RP prefilter scans all n·q pairs by
                   # construction (labeled baseline; the scale
                   # composition is sim_knn_ivf_rp)
                   "sim_knn_rp"}


def classify(ratio: float, key: str, step: float = 10.0) -> str:
    # a documented baseline is labeled as such at ANY ratio — an
    # O(n·q) scan that happens to time near-linear on one step is
    # still the labeled baseline, never "healthy linear" (r10 nit).
    if key in KNOWN_QUADRATIC:
        return "quadratic-baseline (by construction)"
    if ratio > SUPERLINEAR_FACTOR * step:
        return "SUPERLINEAR — investigate"
    if ratio >= DATA_BOUND_FACTOR * step:
        return "data-bound (healthy linear)"
    return "overhead-bound at this scale"


def report(base: dict[str, float], big: dict[str, float],
           step: float = 10.0) -> list[dict]:
    rows = []
    for key in sorted(big, key=lambda k: -big[k]):
        if key not in base or base[key] <= 0:
            continue
        ratio = big[key] / base[key]
        rows.append({
            "query": key,
            "base_s": base[key],
            "big_s": big[key],
            "ratio": round(ratio, 2),
            "class": classify(ratio, key, step),
        })
    return rows


def main() -> None:
    args = sys.argv[1:]
    if not args:
        sys.exit("usage: scale_report.py BENCH.json "
                 "[section|OTHER_BENCH.json]")
    with open(args[0]) as fh:
        a = json.load(fh)
    if len(args) > 1 and args[1].endswith(".json"):
        with open(args[1]) as fh:
            b = json.load(fh)
        base, big = a["queries"], b["queries"]
        step = (b.get("sf") / a.get("sf")
                if a.get("sf") and b.get("sf") else 10.0)
    else:
        section = args[1] if len(args) > 1 else "sf1_synth"
        big_sec = a.get(section)
        if not big_sec:
            sys.exit(f"no {section!r} section in {args[0]} "
                     "(synthesize the corpus and re-run bench.py)")
        base, big = a["queries"], big_sec["queries"]
        step = (big_sec.get("sf") / a.get("sf")
                if a.get("sf") and big_sec.get("sf") else 10.0)
    rows = report(base, big, step=step)
    w = max(len(r["query"]) for r in rows)
    print(f"{'query':{w}s} {'base_s':>8s} {'big_s':>8s} {'ratio':>6s}  class")
    for r in rows:
        print(f"{r['query']:{w}s} {r['base_s']:8.3f} {r['big_s']:8.3f} "
              f"{r['ratio']:6.2f}  {r['class']}")
    flagged = [r for r in rows if r["class"].startswith("SUPERLINEAR")]
    print(f"\n{len(flagged)} superlinear (excl. documented baselines): "
          + ", ".join(r["query"] for r in flagged))


if __name__ == "__main__":
    main()
