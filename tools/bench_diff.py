#!/usr/bin/env python3
"""Compare two bench artifacts per-query: median ratio, worst movers,
ref20 subset totals, and the per-pass JVM telemetry when present.

Accepts either a full one-line bench JSON (bench_result.json) or a
driver BENCH_r*.json wrapper whose `tail` holds the (possibly
truncated) trailing chunk of that line — the comparison runs on the
intersection of queries visible in both.

Usage: bench_diff.py OLD NEW
"""
import json
import re
import sys


def load(path):
    raw = json.load(open(path))
    if isinstance(raw, dict) and "queries" in raw:
        return raw
    s = raw["tail"] if isinstance(raw, dict) else str(raw)
    # a truncated tail: recover "name":sec pairs + trailing metadata
    qs = dict(
        (m.group(1), float(m.group(2)))
        for m in re.finditer(r'"(q\d+_[a-z0-9_]+)":([0-9.]+)', s)
    )
    out = {"queries": qs}
    for key in ("floor_per_pass_sec", "jvm_per_pass", "ref20_sec"):
        m = re.search(r'"%s":(\[[^\]]*\]|[0-9.]+)' % key, s)
        if m:
            out[key] = json.loads(m.group(1))
    return out


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    ratios = sorted((qn[q] / qo[q], q) for q in common if qo[q] > 0.01)
    if ratios:
        med = ratios[len(ratios) // 2]
        print(f"common queries: {len(common)}")
        print(f"sum old={sum(qo[q] for q in common):.1f}s "
              f"new={sum(qn[q] for q in common):.1f}s")
        print(f"median ratio: {med[0]:.3f} ({med[1]})")
        slower = sum(1 for r, _ in ratios if r > 1)
        print(f"slower: {slower}/{len(ratios)}")
        print("worst regressions:")
        for r, q in ratios[-8:][::-1]:
            print(f"  {q}: {qo[q]:.2f} -> {qn[q]:.2f}  ({r:.2f}x)")
        print("best improvements:")
        for r, q in ratios[:5]:
            print(f"  {q}: {qo[q]:.2f} -> {qn[q]:.2f}  ({r:.2f}x)")
    for side, d in (("old", old), ("new", new)):
        if "floor_per_pass_sec" in d:
            print(f"{side} floors: {d['floor_per_pass_sec']}", end="  ")
        if "ref20_sec" in d:
            print(f"{side} ref20: {d['ref20_sec']}", end="")
        print()
        if "jvm_per_pass" in d:
            snaps = d["jvm_per_pass"]
            for i in range(1, len(snaps)):
                a, b = snaps[i - 1], snaps[i]
                print(f"  {side} pass {i}: jit +{b['jit_ms']-a['jit_ms']}ms "
                      f"gc +{b['gc_ms']-a['gc_ms']}ms "
                      f"codecache {b['codecache_mb']}MB "
                      f"metaspace {b['metaspace_mb']}MB "
                      f"classes {b['classes']}")


if __name__ == "__main__":
    main()
