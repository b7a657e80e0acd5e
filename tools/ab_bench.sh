#!/bin/bash
# Same-window A/B bench: the ONLY trustworthy way to price a code change
# on this host. Cross-window comparisons mislead — identical code has
# measured ±15% between recording windows (round-9 full-bench median
# ratio 1.151 on untouched queries), which swamps most real effects on
# sub-second queries. This script prices NEW (working tree if dirty,
# else HEAD) against OLD (stashed tree, else $REF / HEAD~1) back-to-back
# in one window, best-of-$RUNS each, and prints the per-query table.
#
# Usage: tools/ab_bench.sh q99_pagerank,q208_ppr [RUNS] [REF]
#        tools/ab_bench.sh q17_ngram_jaccard 5 HEAD~3
#
# Safe by construction: the working tree is NEVER mutated. The OLD side
# compiles in a detached `git worktree` of its ref — guaranteeing it
# sees exactly that commit's tree (a bare `checkout $REF -- src/main`
# would leave files ADDED since $REF in place, and untracked new
# sources would contaminate both sides).
set -euo pipefail
cd "$(dirname "$0")/.."

QUERIES=${1:?"usage: tools/ab_bench.sh <q1,q2,...> [RUNS] [REF]"}
RUNS=${2:-3}
REF=${3:-HEAD~1}
SF=${SF:-/root/testdata/sf0.1}
CPUS=${CPUS:-32}

JAVA_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  echo --add-opens=java.base/$p=ALL-UNNAMED; done)
bench() { # $1 = build/run dir, $2 = out json
  ( cd "$1" && sbt -batch -error compile >/dev/null )
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" SPARK_GRAFT_BENCH_RUNS="$RUNS" \
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_BENCH_OUT="$2" \
  java $JAVA_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx24g \
    -cp "$1/target/scala-2.13/classes:$1/src/main/resources:/opt/spark/jars/*" \
    graft.Bench 2>/dev/null >/dev/null
}

# Dirty means tracked changes OR untracked files under src/ — a tree
# dirty only in an untracked new source is still a code change.
if ! git diff --quiet || ! git diff --cached --quiet \
    || [ -n "$(git ls-files --others --exclude-standard src/)" ]; then
  OLDREF=HEAD
  echo "A = working tree (dirty), B = HEAD — old side in a detached worktree"
else
  OLDREF=$REF
  echo "A = HEAD, B = $REF — old side in a detached worktree"
fi

WT=$(mktemp -d /tmp/ab_bench_old.XXXXXX)
rmdir "$WT"
git worktree add --detach --quiet "$WT" "$OLDREF"
trap 'git worktree remove --force "$WT" >/dev/null 2>&1 || true' EXIT

bench "$PWD" /tmp/ab_new.json
bench "$WT" /tmp/ab_old.json

python3 - <<'EOF'
import json
o = json.load(open('/tmp/ab_old.json'))
n = json.load(open('/tmp/ab_new.json'))
old, new = o['queries'], n['queries']
print(f"\n{'query':35s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
for k in sorted(old):
    if old[k] > 0 and new.get(k, -1) > 0:
        print(f"{k:35s} {old[k]:8.2f} {new[k]:8.2f} {new[k]/old[k]:6.2f}x")
    else:
        print(f"{k:35s} {old.get(k):>8} {new.get(k):>8}  ERROR")
to, tn = sum(v for v in old.values() if v > 0), sum(v for v in new.values() if v > 0)
print(f"{'TOTAL':35s} {to:8.2f} {tn:8.2f} {tn/to:6.2f}x")
# the deterministic verdict: timing above is advisory (host noise floor
# ±20%/query); changed shuffle volume below is a REAL plan change
ow, nw = o.get('work') or {}, n.get('work') or {}
changed = []
for k in sorted(set(ow) & set(nw)):
    ob = ow[k]['shuffleReadBytes'] + ow[k]['shuffleWriteBytes']
    nb = nw[k]['shuffleReadBytes'] + nw[k]['shuffleWriteBytes']
    if abs(nb - ob) > max(0.02 * max(ob, nb), 262144):
        changed.append((k, ob, nb))
if ow and nw:
    print(f"\nwork: {len(changed)} quer{'y' if len(changed)==1 else 'ies'}"
          " with changed shuffle volume (beyond 2%/256KB jitter)")
    for k, ob, nb in sorted(changed, key=lambda x: x[2] - x[1]):
        print(f"  {k:33s} {ob/1e6:9.1f} MB -> {nb/1e6:9.1f} MB"
              f" ({(nb-ob)/1e6:+.1f} MB)")
EOF
