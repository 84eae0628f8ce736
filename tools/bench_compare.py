#!/usr/bin/env python3
"""Machine-derived bench regression gate.

Diffs two clean-bench JSONs (the {"metric": "total", "queries": {...}}
shape Bench writes / BENCH_CLEAN_r{N}.json carries) and prints, for the
queries common to both, every one whose wall grew by more than the
threshold ratio — plus totals over the common set. The bench commit
message must carry THIS output verbatim, not a hand-written claim
(round-14's "zero >1.5x regressions" was false by a hair for one query
the hand check missed).

Usage: bench_compare.py BASE.json NEW.json [threshold=1.5]
Exit code: 0 always (it is a report, not a gate-failure signal — noise
on a contended host is adjudicated by the reader, with the list in
front of them).
"""
import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    base_path, new_path = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    base = json.load(open(base_path))["queries"]
    new = json.load(open(new_path))["queries"]
    common = sorted(set(base) & set(new))
    only_base = sorted(set(base) - set(new))
    only_new = sorted(set(new) - set(base))
    tb = sum(base[q] for q in common)
    tn = sum(new[q] for q in common)
    print(f"[bench_compare] base={base_path} new={new_path} "
          f"threshold={thr}x")
    print(f"[bench_compare] common={len(common)} "
          f"base_total={tb:.1f}s new_total={tn:.1f}s "
          f"ratio={tn / tb:.3f}x"
          + (f" new_only={len(only_new)}" if only_new else "")
          + (f" removed={len(only_base)}" if only_base else ""))
    regs = [(new[q] / base[q], q) for q in common
            if base[q] > 0 and new[q] / base[q] > thr]
    if not regs:
        print(f"[bench_compare] zero >{thr}x regressions "
              f"on the {len(common)} common queries")
    else:
        print(f"[bench_compare] {len(regs)} >{thr}x regressions:")
        for r, q in sorted(regs, reverse=True):
            print(f"  {q}: {base[q]:.3f}s -> {new[q]:.3f}s = {r:.3f}x")
    imps = sorted(((new[q] / base[q], q) for q in common
                   if base[q] > 0.5 and new[q] / base[q] < 1 / thr))
    if imps:
        print(f"[bench_compare] >{thr}x improvements (base > 0.5s):")
        for r, q in imps:
            print(f"  {q}: {base[q]:.3f}s -> {new[q]:.3f}s = {r:.3f}x")


if __name__ == "__main__":
    main()
