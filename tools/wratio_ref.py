#!/usr/bin/env python3
"""Independent stdlib-only reference implementation of thefuzz 0.22 /
rapidfuzz `fuzz.WRatio` (the scorer behind the reference repo's
`process.extractOne`, scripts/bills/vote_matching.py:161), used to
generate the goldens in FunctionsSpec.

Float-faithful to the published rapidfuzz algorithm:
  - full_process: drop non-ASCII, non-alnum -> space, lowercase, strip
  - ratio = 100 * 2*LCS / (|a|+|b|)  (indel similarity), kept as float
  - branches on length ratio 1.5 / 8.0 with 0.95 (token) and 0.9/0.6
    (partial) scaling
  - similar-length branch: max(ratio, token_sort*0.95, token_set*0.95)
  - length-mismatch branch: max(ratio, partial_ratio*pscale,
    partial_token_sort*0.95*pscale, partial_token_set*0.95*pscale)
  - final round is CPython round() = banker's (HALF_EVEN)

Run: python3 tools/wratio_ref.py 'probe|candidate' ...   (one score per line)
With no args, prints the FunctionsSpec golden table.
"""
import re
import sys


def full_process(s: str) -> str:
    s = s.encode("ascii", "ignore").decode("ascii")
    return re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()


def lcs(s: str, t: str) -> int:
    prev = [0] * (len(t) + 1)
    for ch in s:
        cur = [0] * (len(t) + 1)
        for j, cj in enumerate(t):
            cur[j + 1] = prev[j] + 1 if ch == cj else max(prev[j + 1], cur[j])
        prev = cur
    return prev[len(t)]


def ratio(a: str, b: str) -> float:
    if not a and not b:
        return 100.0
    if not a or not b:
        return 0.0
    return 200.0 * lcs(a, b) / (len(a) + len(b))


def partial_ratio(a: str, b: str) -> float:
    s, t = (a, b) if len(a) <= len(b) else (b, a)
    if not s:
        return 100.0 if not t else 0.0
    best = 0.0
    for i in range(len(t) - len(s) + 1):
        best = max(best, ratio(s, t[i:i + len(s)]))
        if best == 100.0:
            break
    return best


def token_sort_join(s: str) -> str:
    return " ".join(sorted(s.split()))


def token_set_ratio(a: str, b: str) -> float:
    ta, tb = set(a.split()), set(b.split())
    inter = " ".join(sorted(ta & tb))
    c1 = (inter + " " + " ".join(sorted(ta - tb))).strip()
    c2 = (inter + " " + " ".join(sorted(tb - ta))).strip()
    return max(ratio(inter, c1), ratio(inter, c2), ratio(c1, c2))


def partial_token_set_ratio(a: str, b: str) -> float:
    ta, tb = set(a.split()), set(b.split())
    if not ta or not tb:
        return 0.0
    if ta & tb:
        return 100.0
    return partial_ratio(" ".join(sorted(ta - tb)), " ".join(sorted(tb - ta)))


def wratio(a: str, b: str) -> int:
    s1, s2 = full_process(a), full_process(b)
    if not s1 or not s2:
        return 0
    l1, l2 = len(s1), len(s2)
    len_ratio = max(l1, l2) / min(l1, l2)
    base = ratio(s1, s2)
    if len_ratio < 1.5:
        tok = max(ratio(token_sort_join(s1), token_sort_join(s2)),
                  token_set_ratio(s1, s2))
        return round(max(base, tok * 0.95))
    pscale = 0.9 if len_ratio < 8.0 else 0.6
    part = partial_ratio(s1, s2) * pscale
    ptok = max(partial_ratio(token_sort_join(s1), token_sort_join(s2)),
               partial_token_set_ratio(s1, s2)) * 0.95 * pscale
    return round(max(base, part, ptok))


GOLDEN_PAIRS = [
    ("Baldwin", "Tammy Baldwin"),
    ("Barrasso", "John Barrasso"),
    ("Bennet", "Michael F. Bennet"),
    ("Smith", "Smith-Jones (D-CA)"),
    ("Baldwin (D-WI)", "Tammy Baldwin"),
    ("Barrasso (R-WY)", "John Barrasso"),
    ("Bennet (D-CO)", "Michael F. Bennet"),
    ("Tammy Baldwin", "Tammy Baldwin"),
    ("Baldwn (D-WI)", "Tammy Baldwin"),
    ("Zzyzx Qwerty", "Tammy Baldwin"),
    ("Cruz (R-TX)", "Ted Cruz"),
    ("Ocasio-Cortez (D-NY)", "Alexandria Ocasio-Cortez"),
    ("Lee", "A ridiculously long committee description mentioning Lee once"),
    # reordered length-mismatched tokens: the partial_token_* branch
    ("masto cortez", "catherine cortez masto"),
    ("Cortez Masto (D-NV)", "Catherine Cortez Masto"),
    ("Van Hollen", "Chris Van Hollen (D-MD)"),
    ("Blunt Rochester", "Lisa Blunt Rochester"),
]

if __name__ == "__main__":
    if len(sys.argv) > 1:
        for arg in sys.argv[1:]:
            a, b = arg.split("|", 1)
            print(wratio(a, b))
    else:
        for a, b in GOLDEN_PAIRS:
            print(f'("{a}", "{b}", {wratio(a, b)}),')
