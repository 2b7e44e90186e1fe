#!/usr/bin/env python3
"""Cross-run bench artifact diff — the judge's round-over-round
adjudication (shared-query ratio under matching method, with
calibration context) as a tool instead of by-hand arithmetic.

    python3 tools/benchdiff.py BENCH_rA.json BENCH_rB.json [-n TOPK]

Reads two Bench artifacts (the JSON line graft.Bench emits), compares
ONLY the queries present in both (new/removed rows are listed, never
priced), excludes failure sentinels (-1) from both sides, and prints:

  - method check: REFUSES to compare artifacts whose "method" fields
    differ (a noop-sink number is not comparable with a count() one —
    judge-measured 1.457x cross-method delta on identical code);
  - calibration context: each side's calib_median / calib_ref /
    polluted flag, plus the calib ratio (a B/A wall ratio close to
    the calib ratio is load, not code);
  - total and median per-query ratio over the shared set;
  - top regressions and improvements with per-side times.

Dev-only (mirrors tools/check.py's status): the Scala library has no
Python dependency; this reads the artifacts the engine writes.
"""
import argparse
import json
import math
import sys


def load(path):
    """Accept both artifact shapes: the raw Bench line(s)
    (bench_out.json / BENCH_r*_builder.json) and the driver wrapper
    {"n","rc","tail","parsed",...} whose "parsed" is the compact
    queries-free line — the latter degrades to totals-only compare.
    """
    with open(path) as f:
        txt = f.read().strip()
    try:
        whole = json.loads(txt)
    except json.JSONDecodeError:
        whole = None
    if isinstance(whole, dict) and "parsed" in whole:
        d = whole["parsed"]
        if isinstance(d, str):
            d = json.loads(d.replace("'", '"'))
        if "queries" not in d:
            d["queries"] = {}
        return d
    # one JSON object per line; take the last line carrying a
    # per-query map, else the last parsable line
    best = fallback = None
    for line in txt.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict) and "value" in d:
            fallback = d
            if d.get("queries"):
                best = d
    if best is None and fallback is not None:
        fallback.setdefault("queries", {})
        best = fallback
    if best is None:
        sys.exit(f"benchdiff: no parsable artifact line in {path}")
    return best


def median(xs):
    if not xs:
        return float("nan")
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("a", help="baseline artifact (denominator)")
    ap.add_argument("b", help="candidate artifact (numerator)")
    ap.add_argument("-n", "--top", type=int, default=8,
                    help="top regressions/improvements to list")
    ap.add_argument("--force", action="store_true",
                    help="compare despite a method mismatch/absence "
                         "(e.g. a pre-r14 artifact KNOWN to be noop)")
    args = ap.parse_args()
    A, B = load(args.a), load(args.b)

    ma, mb = A.get("method", "?"), B.get("method", "?")
    if ma != mb and not args.force:
        sys.exit(f"benchdiff: REFUSING to compare method={ma!r} "
                 f"({args.a}) with method={mb!r} ({args.b}) — "
                 "cross-method wall times are not comparable "
                 "(--force if both are KNOWN to share a method)")
    if ma != mb:
        print(f"WARNING: method {ma!r} vs {mb!r} compared under "
              "--force — caller asserts both used the same meter")

    qa = {k: v for k, v in A["queries"].items() if v >= 0}
    qb = {k: v for k, v in B["queries"].items() if v >= 0}
    failed_a = sorted(k for k, v in A["queries"].items() if v < 0)
    failed_b = sorted(k for k, v in B["queries"].items() if v < 0)
    shared = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))

    ta = sum(qa[k] for k in shared)
    tb = sum(qb[k] for k in shared)
    ratios = {k: (qb[k] / qa[k]) for k in shared if qa[k] > 0}

    def calib(d):
        return (d.get("calib_median"), d.get("calib_ref"),
                d.get("calib_polluted"))

    ca, cb = calib(A), calib(B)
    print(f"method: {ma} (both)  |  shared {len(shared)} queries; "
          f"only-A {len(only_a)}, only-B {len(only_b)}")
    if failed_a or failed_b:
        print(f"failures excluded: A={failed_a or '[]'} "
              f"B={failed_b or '[]'}")
    print(f"calib A: median={ca[0]} ref={ca[1]} polluted={ca[2]}")
    print(f"calib B: median={cb[0]} ref={cb[1]} polluted={cb[2]}")
    if ca[0] and cb[0]:
        print(f"calib ratio B/A: {cb[0] / ca[0]:.3f}  "
              "(a wall ratio near this is load, not code)")
    if not shared:
        # totals-only mode (a driver wrapper without a per-query map):
        # still print the headline ratio with calib context
        va, vb = A.get("value"), B.get("value")
        if va and vb:
            print(f"TOTALS-ONLY (no shared per-query map): "
                  f"A {va:.1f}s -> B {vb:.1f}s  ratio {vb / va:.3f}x  "
                  "(NOT shared-query-adjusted — new rows inflate B)")
            sys.exit(0)
        sys.exit("benchdiff: no shared successful queries")
    print(f"shared total: A {ta:.1f}s -> B {tb:.1f}s  "
          f"ratio {tb / ta:.3f}x")
    print(f"median per-query ratio: {median(list(ratios.values())):.3f}x")
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:args.top]
    best = sorted(ratios.items(), key=lambda kv: kv[1])[:args.top]
    print(f"\ntop {args.top} regressions (B/A):")
    for k, r in worst:
        print(f"  {r:6.2f}x  {k}  ({qa[k]:.2f}s -> {qb[k]:.2f}s)")
    print(f"top {args.top} improvements (B/A):")
    for k, r in best:
        print(f"  {r:6.2f}x  {k}  ({qa[k]:.2f}s -> {qb[k]:.2f}s)")
    if only_a:
        print(f"\nqueries only in A (not priced): {', '.join(only_a)}")
    if only_b:
        print(f"queries only in B (not priced): {', '.join(only_b)}")
    # exit code: 0 comparable, 2 if either side polluted (numbers
    # carry an asterisk)
    if ca[2] or cb[2]:
        print("\nWARNING: at least one side is calib-polluted — "
              "re-run in a calm window before trusting ratios")
        sys.exit(2)


if __name__ == "__main__":
    main()
