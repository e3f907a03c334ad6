#!/usr/bin/env python3
"""Recompute round-over-round bench ratios from committed artifacts.

Usage:
    python3 tools/bench_ratio.py NEW.json OLD.json [--queries q_a,q_b,...]

Reads two Bench artifacts (the one-line JSON Bench.scala writes to
BENCH_FULL.json), intersects their query sets (optionally restricted to
--queries), and prints:
  - the total-over-shared-queries ratio NEW/OLD (the ONLY ratio any
    SURVEY/commit claim may cite — recomputable by anyone from the
    committed files),
  - per-query repeat spread (max/min across repeats, when the artifact
    carries a "repeats" map), flagging queries whose repeats vary >1.5x —
    those queries' single-min comparisons are untrustworthy,
  - the per-query ratio outliers (top 10 regressions / improvements).

Exit code 0 always (reporting tool, not a gate).
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = [a for a in sys.argv[1:] if a.startswith("--")]
    if len(args) != 2:
        print(__doc__)
        sys.exit(1)
    new, old = load(args[0]), load(args[1])
    restrict = None
    for o in opts:
        if o.startswith("--queries"):
            restrict = set(o.split("=", 1)[1].split(","))
    nq, oq = new.get("queries", {}), old.get("queries", {})
    shared = sorted(
        k for k in nq
        if k in oq and nq[k] >= 0 and oq[k] >= 0
        and (restrict is None or k in restrict))
    if not shared:
        print("no shared queries between the two artifacts")
        sys.exit(0)
    tn = sum(nq[k] for k in shared)
    to = sum(oq[k] for k in shared)
    print(f"shared queries: {len(shared)}")
    print(f"new total {tn:.1f}s  old total {to:.1f}s  "
          f"ratio new/old = {tn / to:.3f}x")

    # repeat spread: flags the queries whose min is not a stable statistic
    flagged = []
    for label, art in (("new", new), ("old", old)):
        reps = art.get("repeats", {})
        for k in shared:
            r = [t for t in reps.get(k, []) if t >= 0]
            if len(r) >= 2 and min(r) > 0 and max(r) / min(r) > 1.5:
                flagged.append((label, k, min(r), max(r)))
    if flagged:
        print(f"\nrepeat spread >1.5x ({len(flagged)} rows) — min-time "
              "comparisons for these are noise-dominated:")
        for label, k, lo, hi in sorted(flagged, key=lambda x: -x[3] / x[2]):
            print(f"  [{label}] {k}: {lo:.2f}s .. {hi:.2f}s "
                  f"({hi / lo:.2f}x)")
    else:
        print("\nno query's repeats vary >1.5x in either artifact")

    ratios = sorted(((nq[k] / oq[k], k) for k in shared if oq[k] > 0.05),
                    reverse=True)
    print("\ntop regressions (new/old):")
    for r, k in ratios[:10]:
        print(f"  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s ({r:.2f}x)")
    print("top improvements (new/old):")
    for r, k in ratios[-10:][::-1]:
        print(f"  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s ({r:.2f}x)")


if __name__ == "__main__":
    main()
