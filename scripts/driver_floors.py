#!/usr/bin/env python3
"""Min-merge the DRIVER's own committed bench history into per-query floors.

Two rounds running, the driver bench host started at loadavg ~11-12 and
read n_over_2x 7-8 while the identical HEAD read 0 on a quiet host — the
per-query gate had no trustworthy signal exactly where it is evaluated
(VERDICT r15 item #3). The fix: give Bench a second reference measured on
the SAME host class as the gate. This script scans every committed
BENCH_r*.json (the driver's per-round artifacts), extracts the per-query
seconds from each round's captured summary tail, keeps the MIN per query
across rounds, and writes DRIVER_FLOORS.json. Bench then reports
vs_driver_floor / driver_over_2x beside vs_baseline, so a loaded driver
run can distinguish "host" from "regression" without cross-referencing a
separately-committed quiet-host bench.

Caveats, by construction:
- The driver tail is capped at ~2000 chars, so each round's "queries" map
  holds only the SLOWEST ~20 queries — the union across rounds covers the
  expensive queries (the only ones the 1.5 s-absolute over-2x gate can
  flag) and omits sub-second ones (which the gate ignores anyway).
- Floors span HEADs: a query whose plan deliberately changed keeps its
  all-time driver best. That is the point — the floor answers "has THIS
  host ever run this query fast", not "is this the current plan's cost"
  (BASELINE_QUERIES.json answers that, on a quiet host).
- Only sf0.1 rounds are merged (the driver bench SF).

Usage: python3 scripts/driver_floors.py   (run from the repo root; rerun
whenever a new BENCH_r*.json lands, commit DRIVER_FLOORS.json)
"""
import glob
import json
import re
import sys

FLOORS_PATH = "DRIVER_FLOORS.json"


def tail_queries(tail: str) -> dict:
    """Extract the flat "queries":{name:sec,...} object from a (possibly
    truncated) bench summary tail. The map is the first "queries" object
    and holds flat numeric values only, so scan to its matching '}'."""
    key = tail.find('"queries"')
    if key < 0:
        return {}
    start = tail.find("{", key)
    end = tail.find("}", start)
    if start < 0 or end < 0:
        return {}
    body = tail[start : end + 1]
    return {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"([A-Za-z0-9_]+)":\s*([0-9.eE+-]+)', body)
    }


def main() -> None:
    floors: dict = {}
    sources = []
    for path in sorted(glob.glob("BENCH_r*.json")):
        try:
            with open(path) as f:
                art = json.load(f)
        except (OSError, json.JSONDecodeError) as e:
            print(f"  skip {path}: {e}", file=sys.stderr)
            continue
        if art.get("sf") != 0.1:
            continue
        tail = art.get("tail", "")
        qs = tail_queries(tail)
        if not qs:
            # silent-{} has two causes: no "queries" key at all (a non-bench
            # artifact — fine), or a capture truncated BEFORE the object's
            # closing '}' — the latter silently drops the whole round from
            # the floor set, so make it loud (a capture-format drift would
            # otherwise shrink the floors with no diagnostic).
            if '"queries"' in tail:
                print(
                    f"  WARNING {path}: tail contains \"queries\" but no "
                    "parseable entries - truncated before the closing brace? "
                    "round dropped from floors",
                    file=sys.stderr,
                )
            continue
        sources.append(path)
        for name, sec in qs.items():
            if sec <= 0:
                continue
            if name not in floors or sec < floors[name]:
                floors[name] = sec
    out = {
        # flat numeric values FIRST and only object named "queries":
        # Bench's parser reads the first '}' after "queries"
        "queries": {k: floors[k] for k in sorted(floors)},
        "sf": 0.1,
        "note": "per-query MIN across the driver's own committed benches "
        "(summary tails hold each round's slowest ~20, so coverage is the "
        "expensive-query union); floors span HEADs by design",
        "sources": sources,
    }
    with open(FLOORS_PATH, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{FLOORS_PATH}: {len(floors)} query floors from {len(sources)} driver benches")


if __name__ == "__main__":
    main()
