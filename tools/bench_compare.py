#!/usr/bin/env python3
"""Per-query diff of two graft.Bench JSON artifacts.

Usage: python3 tools/bench_compare.py <old.json> [new.json] [threshold]

`new.json` defaults to BENCH_full_latest.json — the complete artifact
graft.Bench writes to the working directory on every run.

Prints every common query's old/new seconds and ratio, sorted by ratio
descending, plus queries only present on one side. Exits non-zero if any
common query regressed beyond the threshold (default 1.5x) AND slowed by
more than 0.2s absolute (sub-second queries jitter multiplicatively on a
shared host; a 0.05 -> 0.09 "1.8x" is noise, a 3 -> 5s is not).

Reads either a raw Bench stdout line or a driver BENCH_r*.json wrapper
(falls back to scanning the file for the {"metric":"total"...} line).
Dev tool only — the shipped Scala library has no Python dependency.
"""
import json
import re
import sys


def load(path):
    text = open(path).read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict) and "queries" in doc:
        return doc
    # driver wrapper or log: find the bench line inside
    m = re.search(r'\{"metric":"total".*?"queries":\{.*?\}.*?\}', text)
    if m:
        return json.loads(m.group(0))
    # driver BENCH_r*.json artifacts carry only a truncated "tail" —
    # scrape whatever complete per-query pairs survived the cut
    # quotes may arrive backslash-escaped inside the artifact's string field
    pairs = re.findall(r'\\?"(q\d+[a-z0-9_]*)\\?":(-?\d+(?:\.\d+)?)', text)
    if not pairs:
        sys.exit(f"{path}: no bench JSON found")
    print(f"[{path}: truncated driver tail — {len(pairs)} queries scraped]",
          file=sys.stderr)
    return {"queries": {k: float(v) for k, v in pairs}}


def main():
    # default `new` side: the stable full artifact graft.Bench writes on
    # every run (driver BENCH_r*.json wrappers truncate the tail)
    if len(sys.argv) == 2:
        sys.argv.append("BENCH_full_latest.json")
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq = {k: v for k, v in old["queries"].items() if v > 0}
    nq = {k: v for k, v in new["queries"].items() if v > 0}
    common = sorted(set(oq) & set(nq),
                    key=lambda k: nq[k] / oq[k], reverse=True)
    regressions = []
    print(f"{'query':40s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for k in common:
        ratio = nq[k] / oq[k]
        flag = ""
        if ratio > threshold and nq[k] - oq[k] > 0.2:
            regressions.append(k)
            flag = "  << REGRESSION"
        print(f"{k:40s} {oq[k]:8.2f} {nq[k]:8.2f} {ratio:7.2f}{flag}")
    for k in sorted(set(nq) - set(oq)):
        print(f"{k:40s} {'-':>8s} {nq[k]:8.2f}   (new)")
    for k in sorted(set(oq) - set(nq)):
        print(f"{k:40s} {oq[k]:8.2f} {'-':>8s}   (removed)")
    osum, nsum = sum(oq[k] for k in common), sum(nq[k] for k in common)
    if common and osum > 0:
        print(f"\ncommon-basket total: {osum:.1f}s -> {nsum:.1f}s "
              f"(ratio {nsum / osum:.2f}, {len(common)} queries)")
    else:
        print("\nno common queries with positive old times — nothing to ratio")
    # deterministic WORK channel (round 9): shuffle bytes are a property
    # of the plan over fixed input, not of host load — when both
    # artifacts carry them, a changed byte count is a REAL plan change
    # even where the timing ratio is inside the host's noise floor
    # (±20% per query; see BASELINE.md's A/A calibration)
    ow, nw = old.get("work") or {}, new.get("work") or {}
    wcommon = [k for k in common if k in ow and k in nw]
    if wcommon:
        changed = []
        for k in wcommon:
            ob = ow[k]["shuffleReadBytes"] + ow[k]["shuffleWriteBytes"]
            nb = nw[k]["shuffleReadBytes"] + nw[k]["shuffleWriteBytes"]
            # bytes jitter ~1% run-to-run (map-side combine segment
            # boundaries); a real plan change moves whole exchanges
            if abs(nb - ob) > max(0.02 * max(ob, nb), 262144):
                changed.append((k, ob, nb))
        print(f"\nwork channel ({len(wcommon)} comparable): "
              f"{len(changed)} quer{'y' if len(changed) == 1 else 'ies'} "
              "with changed shuffle volume")
        for k, ob, nb in sorted(changed, key=lambda x: x[2] - x[1]):
            d = nb - ob
            # annotate execution-level explanations (round 11): retried
            # tasks re-read shuffle input (failedTasks > 0), and AQE's
            # BEST-EFFORT exchange-reuse can double a shared subtree on
            # busy-window thread timing (failedTasks == 0, full-run
            # only — see BASELINE.md "q61 and the exchange-reuse race").
            # Either way a byte diff here may not be a plan change.
            fo = ow[k].get("failedTasks")
            fn = nw[k].get("failedTasks")
            note = ""
            if fn:
                note = f"  [new side retried {fn} task(s) — execution, not plan]"
            elif fo:
                note = f"  [old side retried {fo} task(s) — execution, not plan]"
            print(f"  {k:38s} {ob/1e6:10.1f} MB -> {nb/1e6:10.1f} MB "
                  f"({'+' if d > 0 else ''}{d/1e6:.1f} MB){note}")
    if regressions:
        sys.exit(f"{len(regressions)} regression(s) beyond {threshold}x: "
                 + ", ".join(regressions))


if __name__ == "__main__":
    main()
