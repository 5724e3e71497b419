#!/usr/bin/env python3
"""Diff two Verify _walls.json manifests and print the top movers.

Usage: walls_diff.py OLD_walls.json NEW_walls.json [TOP_N]

The walls are Verify dump seconds (query compute + repartition(1)
parquet write + between-query reclamation GC), recorded at every gate
since round 16 (VERDICT r15 item 5). They trend round-over-round against
THEMSELVES — never compare them to BENCH numbers, whose measurement
excludes the write. Movers under 0.5 s absolute are noise at local[*]
task-scheduling granularity and are filtered.
"""
import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    with open(old_path) as f:
        old = json.load(f)
    with open(new_path) as f:
        new = json.load(f)
    rows = []
    for name, nv in new.items():
        ov = old.get(name)
        if ov is None or ov <= 0:
            rows.append((float("inf"), name, ov, nv, "NEW"))
        elif abs(nv - ov) >= 0.5:
            rows.append((abs(nv / ov - 1.0), name, ov, nv,
                         f"{(nv / ov - 1.0) * 100:+.1f}%"))
    gone = sorted(set(old) - set(new))
    rows.sort(reverse=True)
    print(f"# walls diff: {old_path} -> {new_path} "
          f"(old total {sum(old.values()):.1f}s, new total {sum(new.values()):.1f}s, "
          f"{len(rows)} movers >=0.5s abs, top {top_n})")
    for _, name, ov, nv, delta in rows[:top_n]:
        print(f"{name}: {ov if ov is not None else '-'} -> {nv:.3f} ({delta})")
    if gone:
        print(f"# dropped from registry: {', '.join(gone)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
