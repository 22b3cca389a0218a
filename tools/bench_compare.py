#!/usr/bin/env python3
"""Adjudicate two bench artifacts: plan regression vs box noise.

Usage: python3 tools/bench_compare.py <old> <new>
       python3 tools/bench_compare.py --floors <BENCH_FLOORS.json> <new>

Each artifact argument is either a driver BENCH_rN.json (the JSON line
is inside its "tail" field) or a raw line printed by graft.Bench.
Prints the total ratio, the median per-query ratio (the robust signal —
hypervisor noise inflates the mean, not the median), the top spikes
both ways, and the new-format noise fields (runs / probe / spread)
when present.

--floors mode compares one artifact against the best-known per-query
floors ledger (tools/bench_floors.py): a query >25% over its
cross-session floor is worth a look, >2x is the investigate set —
UNLESS the spike set moves between sessions, which is the noise
signature on this box.

Reading the output:
- median ratio ~1.0 with a few 3-5x spikes            -> noise (spikes
  move between runs; a plan regression is stationary)
- median ratio uniformly up AND probe[start|end] >> 1 -> loaded box
- one query up >20% across MULTIPLE sessions while its
  family stays flat                                   -> investigate
  (the q127 case: a real structural cost, found this way in r11)
"""
import json
import re
import sys


def load(path: str) -> dict:
    text = open(path).read()
    try:
        outer = json.loads(text)
        if isinstance(outer, dict) and "tail" in outer:
            text = outer["tail"]
    except json.JSONDecodeError:
        pass
    m = re.search(r'\{"metric".*\}', text)
    if not m:
        sys.exit(f"{path}: no bench JSON line found")
    return json.loads(m.group(0))


def main(old_path: str, new_path: str) -> None:
    old, new = load(old_path), load(new_path)
    qs = sorted(set(old["queries"]) & set(new["queries"]),
                key=lambda k: int(k[1:]))
    ratios = {}
    for q in qs:
        a, b = old["queries"][q], new["queries"][q]
        if a and b and a > 0 and b > 0:
            ratios[q] = b / a
    # malformed-artifact guards: disjoint catalogs / all-errored entries /
    # a zero old total should diagnose, not IndexError or ZeroDivisionError
    if not ratios:
        sys.exit("no comparable queries: the two artifacts share no "
                 "query keys with positive timings (disjoint catalogs, "
                 "or every shared entry is -1/errored)")
    if not old.get("value") or old["value"] <= 0:
        sys.exit(f"old artifact total is {old.get('value')!r} — "
                 "not a usable baseline")
    med = sorted(ratios.values())[len(ratios) // 2]
    print(f"total: {old['value']:.2f} -> {new['value']:.2f} "
          f"({new['value'] / old['value']:.3f}x)")
    print(f"median per-query ratio: {med:.3f} over {len(ratios)} queries")
    for tag, j in (("old", old), ("new", new)):
        noise = {k: j[k] for k in ("runs", "probe", "spread") if k in j}
        print(f"{tag} noise fields: {noise or '(pre-r11 format: none)'}")
    up = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
    down = sorted(ratios.items(), key=lambda kv: kv[1])[:8]
    print("top regressions (new/old):")
    for q, r in up:
        print(f"  {q:6s} {r:5.2f}x  "
              f"{old['queries'][q]:.3f} -> {new['queries'][q]:.3f}")
    print("top improvements:")
    for q, r in down:
        print(f"  {q:6s} {r:5.2f}x  "
              f"{old['queries'][q]:.3f} -> {new['queries'][q]:.3f}")
    spikes = [q for q, r in ratios.items() if r > 2.0]
    if spikes:
        print(f"spikes >2x: {spikes} — check whether the SAME queries "
              "spike in another session before reading as regression")


def floors_mode(floors_path: str, new_path: str) -> None:
    # one normalization definition for the ledger and the comparator —
    # a format tweak updated in one tool must not silently desync the two
    from bench_floors import qkey
    floors = json.load(open(floors_path)).get("queries", {})
    new = load(new_path)
    timings = {}
    for name, v in new.get("queries", {}).items():
        q = qkey(name)
        if q is not None and isinstance(v, (int, float)) and v > 0:
            timings[q] = v
    rows = []
    for q, e in floors.items():
        v = timings.get(q)
        if v is not None and e["floor"] > 0:
            rows.append((q, v / e["floor"], e["floor"], v, e["source"]))
    if not rows:
        sys.exit("no comparable queries between the floors ledger and "
                 "the artifact")
    rows.sort(key=lambda r: -r[1])
    med = sorted(r[1] for r in rows)[len(rows) // 2]
    at_floor = sum(1 for r in rows if r[1] <= 1.001)
    print(f"{len(rows)} queries vs floors ({floors_path}); "
          f"median over-floor {med:.2f}x; {at_floor} at/below floor")
    over = [r for r in rows if r[1] > 1.25]
    if not over:
        print("no query >25% over its cross-session floor")
    else:
        print("queries >25% over floor (check spike MOBILITY across "
              "sessions before reading as regression):")
        for q, r, fl, v, src in over[:15]:
            print(f"  {q:6s} {r:5.2f}x  floor {fl:.3f} ({src}) -> {v:.3f}")
    improved = [r for r in rows if r[1] < 1.0]
    if improved:
        print(f"{len(improved)} queries BELOW their recorded floor — run "
              "tools/bench_floors.py to ratchet the ledger")


if __name__ == "__main__":
    if len(sys.argv) == 4 and sys.argv[1] == "--floors":
        floors_mode(sys.argv[2], sys.argv[3])
    elif len(sys.argv) == 3:
        main(sys.argv[1], sys.argv[2])
    else:
        sys.exit(__doc__)
