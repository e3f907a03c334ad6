#!/usr/bin/env python3
"""Recompute round-over-round bench ratios from committed artifacts.

Usage:
    python3 tools/bench_ratio.py NEW.json OLD.json [--queries q_a,q_b,...]
        [--gate=1.5]

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

With --gate=R (VERDICT r11 item 8) the tool becomes a GATE: exit 1 when
any shared query's min regressed more than Rx AND its repeats are stable
(spread <= 1.5x in both artifacts — an unstable min is noise, not a
regression), so a real slowdown fails loudly in the round that ships it
instead of in the next verdict. Without --gate, exit 0 always.

With --watermark=BENCH_r05.json [--watermark-max=1.25] the gate ALSO
fails when the total over the queries shared with the watermark artifact
crosses the ceiling — the long-horizon claw-back check (VERDICT r12
item 6) that a per-round 1.5x gate cannot see.

With --attribution=ATTRIBUTION_r{N}.json (VERDICT r13 item 6) the gate
consumes the round's committed attribution file: a stable-repeat
regression whose query appears in that file's top-level "attributed" map
(query name -> one-line reason, backed by the file's same-box A/B
evidence sections) is reported but does NOT fail the gate — so "gate
failed + side JSON" stops being a normal round close, while an
UNATTRIBUTED flag still exits non-zero. The map must be explicit: the
gate never infers attribution from evidence sections.

Round workflow: the previous round's full builder artifact is kept as
BENCH_FULL_r{N}.json; before committing a round-closing BENCH_FULL.json,
run  python3 tools/bench_ratio.py BENCH_FULL.json BENCH_FULL_r{N}.json
--gate=1.5 --watermark=BENCH_r05.json  and treat a non-zero exit as a
blocker. THEN (VERDICT r15 item 9) run the same gate with the previous
round's DRIVER artifact as OLD:
  python3 tools/bench_ratio.py BENCH_FULL.json BENCH_r{N}.json \
      --gate=1.5 --attribution=ATTRIBUTION_r{N+1}.json
— the driver's re-run is the artifact of record the judge grades, so
what IT flags needs an attribution entry (or a fix) in the SAME round,
not the next one. (Driver
BENCH_r{N}.json artifacts are LEFT-truncated — the loader recovers what
survives via the repeats map, but only the full artifacts make a
complete baseline.)
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    # driver artifact (BENCH_rNN.json): the Bench line rides in a
    # possibly-TRUNCATED "tail" string — recover the per-query map (and
    # repeats, when the map survived truncation) by regex. The per-entry
    # regexes apply only FROM the '"queries":{' / '"repeats":{' markers
    # (ADVICE r12): unanchored, they'd also match any other numeric map
    # keyed by query name riding in the tail (per-query diag counters)
    # and skew the gate with non-timing values.
    import re
    tail = d.get("tail", "")

    def section(marker):
        # the slice from the marker to its closing brace (maps are flat —
        # scalar or array values only, so the first '}' closes the map);
        # a LEFT-truncated tail may hold the map's suffix without its
        # marker — fall back to the tail start only when no LATER marker
        # of another section would be crossed
        i = tail.find(marker)
        if i >= 0:
            j = tail.find("}", i)
            return tail[i:j if j >= 0 else len(tail)]
        return ""

    qsec = section('"queries":{')
    rsec = section('"repeats":{')
    if not qsec and not rsec:
        # headless suffix of a left-truncated tail: keep the old permissive
        # scan but ONLY up to the first '}' (one map's remnant), so later
        # intact maps (diag counters) cannot contribute entries
        head = tail[:tail.find("}") + 1 or len(tail)]
        qsec = rsec = head
    q = {k: float(v)
         for k, v in re.findall(r'"(q[^"]+)":([0-9.]+)', qsec)}
    reps = {}
    for k, arr in re.findall(r'"(q[^"]+)":\[([0-9.,]+)\]', rsec):
        reps[k] = [float(x) for x in arr.split(",")]
    # driver tails truncate from the LEFT, often losing the queries map
    # while the repeats map survives — the min over repeats IS the
    # reported per-query time, so recover it from there
    for k, r in reps.items():
        if k not in q and r:
            q[k] = min(r)
    # box_health rides near the head of the line, so a left-truncated
    # driver tail usually loses it — recover when its marker survived
    bh = {}
    bsec = section('"box_health":{')
    for k, v in re.findall(r'"([a-z_]+)":([0-9.]+)', bsec):
        bh[k] = float(v)
    return {"queries": q, "repeats": reps, "box_health": bh}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = [a for a in sys.argv[1:] if a.startswith("--")]
    if len(args) != 2:
        print(__doc__)
        sys.exit(1)
    new, old = load(args[0]), load(args[1])
    restrict = None
    gate = None
    for o in opts:
        if o.startswith("--queries"):
            restrict = set(o.split("=", 1)[1].split(","))
        if o.startswith("--gate"):
            gate = float(o.split("=", 1)[1])
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

    # box_health (VERDICT r14 item 6): each artifact carries a fixed-work
    # machine probe (BoxHealth.scala); print per-field new/old ratios next
    # to the total so "the window was degraded, not the code" is visible
    # IN the artifacts — contention shows as cpu_mt_s ratio >> cpu_st_s
    # ratio (same fixed work, only the box changed).
    nb, ob = new.get("box_health") or {}, old.get("box_health") or {}
    if nb and ob:
        print("box_health new/old (ratio >1 = new window slower; for "
              "*_mbps, <1 = slower):")
        for fld in ("cpu_st_s", "cpu_mt_s", "io_w_mbps", "io_r_mbps",
                    "gc_probe_ms", "shuffle_s"):
            a, b = nb.get(fld), ob.get(fld)
            if a is not None and b and float(b) > 0:
                print(f"  {fld}: {float(a):.3f} vs {float(b):.3f} "
                      f"({float(a) / float(b):.2f}x)")
        # box-normalized TOTAL (VERDICT r16 item 10): quote the total ratio
        # with the windows' fixed-work cpu_st drift divided out, clamped to
        # the documented ±1.25x drift band so a wild probe can't excuse (or
        # manufacture) a regression. The RAW ratio above stays the only one
        # a SURVEY claim may cite without also citing this scale.
        a, b = nb.get("cpu_st_s"), ob.get("cpu_st_s")
        if a and b and float(b) > 0:
            drift = float(a) / float(b)
            bs = max(1 / 1.25, min(drift, 1.25))
            print(f"total normalized by box cpu_st drift: {tn / to / bs:.3f}x"
                  f" (drift {drift:.2f}x, clamped to [0.80, 1.25])")
    elif nb or ob:
        which = "old" if nb else "new"
        print(f"box_health: only one artifact carries the probe "
              f"({which} artifact predates it)")

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

    # committed attribution (VERDICT r13 item 6): an explicit
    # query -> reason map inside the round's ATTRIBUTION file; only
    # queries listed there are excused from the gate, and the excusal
    # is printed so the round close stays auditable
    attributed = {}
    for o in opts:
        if o.startswith("--attribution="):
            with open(o.split("=", 1)[1]) as f:
                attributed = json.load(f).get("attributed", {})
            if not isinstance(attributed, dict):
                print("--attribution: the file's 'attributed' key must be "
                      "a {query: reason} map")
                sys.exit(1)

    if gate is not None:
        noisy = {k for _, k, _, _ in flagged}
        # absolute-delta floor: a 1.6x ratio on a 0.2s query is timer
        # granularity, not a shipped regression — require the slowdown
        # to also cost real wall time before failing the round
        over = [(r, k) for r, k in ratios
                if r > gate and k not in noisy and oq[k] > 0.05
                and nq[k] - oq[k] > 0.5]
        excused = [(r, k) for r, k in over if k in attributed]
        bad = [(r, k) for r, k in over if k not in attributed]
        if excused:
            print(f"\nattributed regressions ({len(excused)}, gate-excused "
                  "by the committed attribution file):")
            for r, k in excused:
                print(f"  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s ({r:.2f}x) — "
                      f"{attributed[k]}")
        if bad:
            print(f"\nGATE FAILED (--gate={gate}): "
                  f"{len(bad)} UNATTRIBUTED stable-repeat regression(s) "
                  f"above {gate}x:")
            for r, k in bad:
                print(f"  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s ({r:.2f}x)")
            sys.exit(1)
        print(f"\ngate passed: no unattributed stable-repeat regression "
              f"above {gate}x")

    # r5-watermark gate (VERDICT r12 item 6): the long-horizon claw-back
    # check. Compares NEW against the frozen watermark artifact over their
    # shared queries and fails when the total ratio crosses the ceiling —
    # so slow drift that no single round's 1.5x gate catches still fails
    # the round that lets it accumulate. Box drift alone measured ~1.27x
    # on the r5 set (WATERMARK_r12.json), hence the default 1.25 applies
    # to the ratio honestly recomputed per-run, not to a cross-box myth.
    wm_path, wm_max = None, 1.25
    for o in opts:
        if o.startswith("--watermark="):
            wm_path = o.split("=", 1)[1]
        if o.startswith("--watermark-max="):
            wm_max = float(o.split("=", 1)[1])
    if wm_path:
        wm = load(wm_path)
        wq = wm.get("queries", {})
        wshared = sorted(k for k in nq if k in wq and nq[k] >= 0
                         and wq[k] >= 0)
        if not wshared:
            print("\nwatermark: no shared queries — check the artifact")
            sys.exit(1)
        wn = sum(nq[k] for k in wshared)
        wo = sum(wq[k] for k in wshared)
        ratio = wn / wo
        print(f"\nwatermark ({wm_path}): {len(wshared)} shared queries, "
              f"new {wn:.1f}s vs watermark {wo:.1f}s = {ratio:.3f}x "
              f"(ceiling {wm_max}x)")
        # box_health-NORMALIZED watermark (VERDICT r15 item 2): the r5
        # artifact predates the probe, so box drift between ITS window
        # and the current one is invisible to the raw ratio — suite
        # growth and box state erode the gate's meaning. Normalization:
        # WATERMARK_REF.json freezes a committed healthy-window probe
        # (provenance inside the file); the scale is the LEAST-degraded
        # of the fixed-work probe fields (min of cpu_st_s and shuffle_s
        # ratios — min excuses the least), clamped to [1.0, 1.25] (a
        # fast box never helps the score; a wild probe can't excuse
        # everything). BOTH numbers always print; the gate passes if
        # EITHER clears the ceiling, and the raw ratio stays the only
        # one a SURVEY claim may cite without also citing the scale.
        norm_ratio, scale = None, 1.0
        try:
            import os
            ref_path = os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "..", "WATERMARK_REF.json")
            ref = json.load(open(ref_path)).get("box_health", {})
            bh = new.get("box_health") or {}
            if ref and bh:
                field_ratios = [bh[f] / ref[f]
                                for f in ("cpu_st_s", "shuffle_s")
                                if f in bh and f in ref and ref[f] > 0]
                if field_ratios:
                    scale = max(1.0, min(min(field_ratios), 1.25))
                    norm_ratio = ratio / scale
                    print(f"watermark normalized: {norm_ratio:.3f}x "
                          f"(box scale {scale:.3f} = min of probe-field "
                          f"ratios vs WATERMARK_REF, clamped [1, 1.25])")
        except FileNotFoundError:
            pass
        effective = min(ratio, norm_ratio) if norm_ratio else ratio
        if effective > wm_max:
            print(f"WATERMARK GATE FAILED: raw {ratio:.3f}x"
                  + (f" / normalized {norm_ratio:.3f}x" if norm_ratio
                     else "")
                  + f" > {wm_max}x — the r5 set has re-accumulated "
                  "slowdown; attribute or fix before closing the round")
            sys.exit(1)
        print("watermark gate passed")


if __name__ == "__main__":
    main()
