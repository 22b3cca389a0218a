#!/usr/bin/env python3
"""Maintain BENCH_FLOORS.json: the best-known per-query floor across
every bench session, with provenance.

Usage: python3 tools/bench_floors.py <floors.json> <artifact>...

Each <artifact> is a driver BENCH_rN.json or a raw graft.Bench line
(same formats bench_compare.py accepts). The output maps each query to
its minimum observed timing and the artifact it came from, RATCHETING
against an existing <floors.json> — a floor only ever goes down. Host
CPU delivery on this box fluctuates at sub-minute timescales (PLANS.md
round-11 characterization), so no single session's numbers are floors;
this ledger is the cross-session minimum that adjudication needs,
replacing the per-round dig through PLANS.md prose.

`total_floor` is the sum of per-query floors — an idealized
every-query-at-its-best total no real session reaches; compare sessions
against it directionally, not as a target.

SOURCE POLICY: do NOT feed BENCH_r01/r02 into the ledger. The
similarity family (q41/q44/q47) was reimplemented after r01 for
100 TB scale (kernel/dispatch machinery), and those artifacts' floors
for the old implementations (2-3x below every later round) are
unreachable targets that would flag the rewritten queries every round.
A floor should be the best of the CURRENT implementation lineage —
when a query is deliberately reimplemented, delete its ledger entry so
it re-seeds from the new lineage's sessions.
"""
import json
import os
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
        # a driver artifact with a truncated tail (BENCH_r03) carries no
        # parseable line — skip it rather than abort the whole ratchet
        print(f"warning: {path}: no bench JSON line found, skipped",
              file=sys.stderr)
        return {}
    return json.loads(m.group(0))


def qkey(name: str):
    """Normalize 'q04_value_by_type' (pre-r5 artifact format) and 'q04'
    to one key; None for non-query keys."""
    m = re.match(r"^q(\d+)", name)
    return f"q{int(m.group(1)):02d}" if m else None


def main(floors_path: str, artifacts: list) -> None:
    floors = {}
    if os.path.exists(floors_path):
        floors = json.load(open(floors_path)).get("queries", {})
    for path in artifacts:
        j = load(path)
        src = os.path.basename(path)
        for name, v in j.get("queries", {}).items():
            q = qkey(name)
            if q is None or not isinstance(v, (int, float)) or v <= 0:
                continue
            if q not in floors or v < floors[q]["floor"]:
                floors[q] = {"floor": round(v, 3), "source": src}
    if not floors:
        sys.exit("no usable query timings in any artifact")
    out = {
        "comment": "best-known per-query floors across all bench "
                   "sessions; regenerate each round with "
                   "tools/bench_floors.py (ratchets: floors only drop)",
        "total_floor": round(sum(e["floor"] for e in floors.values()), 2),
        "queries": dict(sorted(floors.items(),
                               key=lambda kv: int(kv[0][1:]))),
    }
    with open(floors_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"{floors_path}: {len(floors)} queries, "
          f"total_floor {out['total_floor']}")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2:])
