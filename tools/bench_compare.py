#!/usr/bin/env python3
"""Round-over-round bench comparison with plan-fingerprint attribution.

Usage: python3 tools/bench_compare.py <old_bench.json> <new_bench.json> [band]
       python3 tools/bench_compare.py --fp-lint <old.json> <new.json> <PERF.md>

For every key present in both artifacts, prints the time ratio new/old and
whether the key's compile-time plan fingerprint changed. Keys outside the
drift band (default 1.25x either way) are listed with attribution:
  PLAN  - the fingerprint changed: the plan changed, investigate the diff
  BOX   - same fingerprint: scheduler/box noise or data change, re-pin

--fp-lint is the CI form of the drift protocol (PERF.md "plan_fp
conventions"): every key whose fingerprint changed between the committed
artifact and the refreshed one must be named in PERF.md — a plan change
that ships unexplained fails the gate. Exit 1 lists the unexplained keys.
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main(old_path, new_path, band=1.25):
    old, new = load(old_path), load(new_path)
    qo, qn = old.get("queries", {}), new.get("queries", {})
    so, sn = old.get("staging_sec", {}), new.get("staging_sec", {})
    fo, fn = old.get("plan_fp", {}), new.get("plan_fp", {})
    shared = sorted(set(qo) & set(qn))
    print(f"shared keys: {len(shared)}  (old {len(qo)}, new {len(qn)})")
    fp_changed = [k for k in shared if k in fo and k in fn and fo[k] != fn[k]]
    print(f"plan fingerprints changed: {len(fp_changed)}"
          + (f" -> {', '.join(fp_changed)}" if fp_changed else ""))
    ratios = []
    flagged = []
    for k in shared:
        o = max(qo[k] - so.get(k, 0.0), 1e-3)
        n = max(qn[k] - sn.get(k, 0.0), 1e-3)
        r = n / o
        ratios.append(r)
        if r > band or r < 1 / band:
            cause = ("PLAN" if k in fo and k in fn and fo[k] != fn[k]
                     else "BOX " if k in fo and k in fn else "N/A ")
            flagged.append((r, k, o, n, cause))
    ratios.sort()
    med = ratios[len(ratios) // 2] if ratios else float("nan")
    to = sum(max(qo[k] - so.get(k, 0.0), 0) for k in shared)
    tn = sum(max(qn[k] - sn.get(k, 0.0), 0) for k in shared)
    print(f"net shared total: {to:.1f}s -> {tn:.1f}s ({tn / to:.3f}x), "
          f"median per-key ratio {med:.3f}")
    if flagged:
        print(f"\nkeys outside the {band}x band (net of staging):")
        for r, k, o, n, cause in sorted(flagged, reverse=True):
            print(f"  {cause} {k}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    else:
        print(f"no keys outside the {band}x band")
    return 0


def fp_lint(old_path, new_path, perf_path):
    old, new = load(old_path), load(new_path)
    fo, fn = old.get("plan_fp", {}), new.get("plan_fp", {})
    changed = sorted(k for k in set(fo) & set(fn) if fo[k] != fn[k])
    if not changed:
        print("fp-lint ok: no plan fingerprints changed")
        return 0
    with open(perf_path) as f:
        perf = f.read()
    # Whole-word match: key K is documented only when PERF.md names K
    # itself, not merely a longer key containing K or prose that happens
    # to contain the substring (r13 ADVICE).
    unexplained = [k for k in changed
                   if not re.search(r"\b" + re.escape(k) + r"\b", perf)]
    for k in changed:
        mark = "UNEXPLAINED" if k in unexplained else "documented "
        print(f"  {mark} plan_fp changed: {k}")
    if unexplained:
        print(f"fp-lint FAIL: {len(unexplained)} fp-changed key(s) not "
              f"mentioned in {perf_path} — document the plan change there",
              file=sys.stderr)
        return 1
    print(f"fp-lint ok: {len(changed)} changed fingerprint(s), all documented")
    return 0


if __name__ == "__main__":
    if sys.argv[1] == "--fp-lint":
        sys.exit(fp_lint(sys.argv[2], sys.argv[3], sys.argv[4]))
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 1.25))
