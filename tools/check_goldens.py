#!/usr/bin/env python3
"""Pinned-output golden check for the rows-only queries.

The DuckDB oracle cannot express the custom-hash/sketch/float-iteration
queries (q15-18/20/23/35/39/45/47/50/52/53), so the driver only checks
"returned rows" for them. That leaves silent output drift — e.g. a band-
geometry change altering the emitted pair set — invisible to both gates.
This tool pins each rows-only query's canonical output hash per scale
factor and fails on any drift.

Usage:
  python3 tools/check_goldens.py <verifyOutDir> <sfLabel>            # check
  python3 tools/check_goldens.py <verifyOutDir> <sfLabel> --record   # (re)pin
  python3 tools/check_goldens.py <dir> sf1 --only=q99_pagerank,...    # explicit lane list (may include oracle-covered queries)

<verifyOutDir> is a `graft.Verify` output directory; <sfLabel> names the
snapshot bucket (e.g. sf0.01). Snapshots live in tools/goldens.json.
Canonicalization mirrors the driver/check_oracle discipline: columns
sorted by name, rows sorted by all columns, dtype-sensitive strings,
sha256 over the CSV bytes. Dev tool only — the shipped Scala library has
no Python dependency.
"""
import hashlib
import json
import os
import sys

import pyarrow.parquet as pq

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens.json")


def frame_hash(path):
    df = pq.read_table(path).to_pandas()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    csv = df.astype(str).to_csv(index=False)
    return len(df), hashlib.sha256(csv.encode()).hexdigest()


def main(out_dir, sf_label, record=False, only=None):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    goldens = json.load(open(GOLDENS)) if os.path.exists(GOLDENS) else {}
    bucket = goldens.setdefault(sf_label, {})
    n_ok = n_bad = 0
    if only is not None:
        # explicit query list (sf1 scale lane): pin/check EXACTLY these,
        # oracle-covered or not — at sf1 there is no DuckDB pass, so the
        # pinned hash is the only output-drift check the lane has
        names = sorted(n for n in only
                       if os.path.isdir(os.path.join(out_dir, n)))
        missing = sorted(set(only) - set(names))
        if missing:
            print(f"FAIL missing verify output for: {', '.join(missing)}")
            n_bad += len(missing)
    else:
        names = sorted(n for n in os.listdir(out_dir)
                       if n not in oracle and os.path.isdir(os.path.join(out_dir, n)))
    for name in names:
        rows, digest = frame_hash(os.path.join(out_dir, name))
        if record:
            bucket[name] = {"rows": rows, "sha256": digest}
            print(f"PIN  {name} ({sf_label}): {rows} rows, {digest[:16]}…")
            n_ok += 1
        elif name not in bucket:
            print(f"FAIL {name} ({sf_label}): no pinned golden — run --record")
            n_bad += 1
        elif bucket[name] == {"rows": rows, "sha256": digest}:
            print(f"OK   {name} ({sf_label}): {rows} rows match pinned hash")
            n_ok += 1
        else:
            print(f"FAIL {name} ({sf_label}): drift — got {rows} rows/"
                  f"{digest[:16]}…, pinned {bucket[name]['rows']} rows/"
                  f"{bucket[name]['sha256'][:16]}…")
            n_bad += 1
    if record:
        json.dump(goldens, open(GOLDENS, "w"), indent=2, sort_keys=True)
        print(f"\nwrote {GOLDENS}")
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    only = None
    for a in sys.argv[3:]:
        if a.startswith("--only="):
            only = [q for q in a[len("--only="):].split(",") if q]
    sys.exit(main(sys.argv[1], sys.argv[2], "--record" in sys.argv[3:], only))
