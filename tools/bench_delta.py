#!/usr/bin/env python
"""Per-arm bench delta table between two round artifacts.

Usage:  python tools/bench_delta.py BENCH_r04.json BENCH_r05.json
        python tools/bench_delta.py BENCH_r04.json BENCH/bench_latest.json

Accepts both artifact shapes: the structured form ({"queries": ...,
"throughput": ...}) and the legacy driver capture ({"tail": "<stdout
suffix>"} — the JSON line is recovered from the tail when possible;
arms whose numbers were truncated off the front are shown as absent,
never guessed).
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    if "parsed" in d and d["parsed"]:
        return d["parsed"]
    tail = d.get("tail", "")
    # the stdout JSON line may be truncated at the FRONT: recover every
    # complete "name": number pair per section
    out: dict = {"queries": {}, "throughput": {}}
    for sect in ("queries", "throughput"):
        m = re.search(r'"%s":\s*{([^}]*)}' % sect, tail)
        if m:
            for k, v in re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', m.group(1)):
                out[sect][k] = float(v)
    # a fully-truncated "queries" header: salvage leading pairs before
    # the first section marker (they belong to queries)
    if not out["queries"]:
        head = tail.split('"throughput"')[0]
        for k, v in re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', head):
            if k not in ("sf", "cpus", "value"):
                out["queries"][k] = float(v)
    return out


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a.get("queries", {}), b.get("queries", {})
    ta, tb = a.get("throughput", {}), b.get("throughput", {})
    names = sorted(set(qa) | set(qb))
    print(f"{'arm':<22} {'old_s':>8} {'new_s':>8} {'wall':>7} "
          f"{'old_thr':>12} {'new_thr':>12} {'thr':>7}")
    for n in names:
        osec, nsec = qa.get(n), qb.get(n)
        othr, nthr = ta.get(n), tb.get(n)
        wall = f"{osec / nsec:6.2f}x" if osec and nsec else "      -"
        thr = f"{nthr / othr:6.2f}x" if othr and nthr else "      -"
        fmt = lambda v, w: f"{v:>{w}.1f}" if v is not None else " " * (w - 1) + "-"
        print(f"{n:<22} {fmt(osec, 8)} {fmt(nsec, 8)} {wall} "
              f"{fmt(othr, 12)} {fmt(nthr, 12)} {thr}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piped into head
        pass
