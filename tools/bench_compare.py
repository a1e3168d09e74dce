#!/usr/bin/env python3
"""Cross-round bench comparison: raw AND calibration-normalized ratios
(BASELINE.md bench-provenance convention, VERDICT r15 item 1).

  python3 tools/bench_compare.py BENCH_LOCAL_r15.json BENCH_LOCAL_r16.json

Raw ratio = sum of shared per-query minima, new/old. The normalization
denominator is the shuffle-probe band: the median of the new record's
interleaved `calibration_s.shuffle_probes` (r16+) over the old record's
probe estimate (its probe median too if it has one, else the mean of its
pre/post bracket pair). Normalized ratio = raw / band ratio.
"""
import json, statistics, sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))

oq, nq = old["queries"], new["queries"]
shared = sorted(set(oq) & set(nq))
only_old = sorted(set(oq) - set(nq))
only_new = sorted(set(nq) - set(oq))

raw_old = sum(oq[k] for k in shared)
raw_new = sum(nq[k] for k in shared)
raw_ratio = raw_new / raw_old

ratios = sorted((nq[k] / oq[k] if oq[k] > 0 else float("inf"), k) for k in shared)
vals = [r for r, _ in ratios]
def pct(p):
    i = max(0, min(len(vals) - 1, round(p * (len(vals) - 1))))
    return vals[i]

def probe_band(rec):
    c = rec.get("calibration_s", {})
    probes = c.get("shuffle_probes") or []
    if probes:
        return statistics.median(probes), f"median of {len(probes)} interleaved probes"
    pre, post = c.get("shuffle_pre"), c.get("shuffle_post")
    if pre is not None and post is not None:
        return (pre + post) / 2, "mean of pre/post bracket pair"
    return None, "no calibration data"

ob, osrc = probe_band(old)
nb, nsrc = probe_band(new)

print(f"shared queries: {len(shared)}  (+{len(only_new)} new, -{len(only_old)} gone)")
print(f"raw totals (shared): old={raw_old:.1f}s new={raw_new:.1f}s ratio={raw_ratio:.3f}")
print(f"per-query min-ratio p10={pct(.10):.2f} median={pct(.50):.2f} p90={pct(.90):.2f}")
bad = [(k, oq[k], nq[k]) for k in shared if nq[k] > 2 * oq[k] + 0.5]
print(f"queries beyond 2x+0.5s: {len(bad)}")
for k, o, n in sorted(bad, key=lambda t: -t[2] / max(t[1], 1e-9))[:15]:
    print(f"  {k}: {o:.2f}s -> {n:.2f}s ({n / max(o, 1e-9):.2f}x)")
print(f"old probe band: {ob and f'{ob:.3f}s'} ({osrc})")
print(f"new probe band: {nb and f'{nb:.3f}s'} ({nsrc})")
if ob and nb:
    band = nb / ob
    print(f"band ratio (new/old): {band:.3f}")
    print(f"calibration-NORMALIZED ratio: {raw_ratio / band:.3f}")
np = (new.get("calibration_s") or {}).get("shuffle_probes") or []
if np:
    print(f"new interleaved probes: n={len(np)} min={min(np):.3f} "
          f"median={statistics.median(np):.3f} max={max(np):.3f}")
errs = new.get("errors") or {}
if errs:
    print(f"ERRORS in new record: {errs}")
