#!/usr/bin/env python3
"""Re-floor the bench gate at HEAD (round-15 policy).

BASELINE_QUERIES.json used to keep the ALL-TIME per-query minimum across
code generations. That gate loses its signal the moment a plan change
deliberately trades sf0.1 seconds for measured linear scaling (the
round-14 adaptive-capacity rules): the changed queries trip 2x-of-floor
forever, so real regressions drown in expected flags. Policy now:

  - `queries`      = per-query floors measured AT HEAD on a quiet host
                     (min over this run's min-of-N and, for unchanged
                     queries, the previous floor — a re-floor must never
                     RAISE the bar for a query whose plan didn't change);
  - `alltime_min`  = the historical minimum per query, kept for drift
                     archaeology, NEVER read by the gate;
  - floors re-measure whenever a deliberate plan change lands (the
    changed queries listed in --changed take the fresh HEAD number even
    if it is slower than the old floor).

Usage:
  python3 scripts/refloor.py BENCH_FULL.json BASELINE_QUERIES.json \
      [--changed q1,q2,...] [--note "..."]

Writes BASELINE_QUERIES.json in place (git history is the backup).
"""
import json, sys

def main():
    args = sys.argv[1:]
    changed, note = set(), None
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--changed":
            changed = set(args[i + 1].split(",")); i += 2
        elif args[i] == "--note":
            note = args[i + 1]; i += 2
        else:
            pos.append(args[i]); i += 1
    bench_path, base_path = pos
    bench = json.load(open(bench_path))
    old = json.load(open(base_path))
    old_q = old.get("queries", {})
    old_alltime = old.get("alltime_min", old_q)
    fresh = bench["queries"]

    new_q, alltime = {}, {}
    # union includes alltime-only names: a query removed in an EARLIER
    # refloor lives only in old_alltime, and iterating fresh|old_q alone
    # would silently drop its history on the next run — contradicting the
    # "kept for archaeology, never read by the gate" policy
    for q in sorted(set(fresh) | set(old_q) | set(old_alltime)):
        f, o = fresh.get(q), old_q.get(q)
        if f is None:            # query removed at HEAD: drop from the gate,
            hist = old_alltime.get(q, o)         # keep history
            if hist is not None:
                alltime[q] = hist
            continue
        if q in changed or o is None:
            new_q[q] = f         # deliberate plan change (or new query): HEAD is the floor
        else:
            new_q[q] = min(f, o) # unchanged plan: never raise the bar
        alltime[q] = min(x for x in [f, o, old_alltime.get(q)] if x is not None)

    out = {
        "note": note or old.get("note", ""),
        "queries": {k: round(v, 3) for k, v in new_q.items()},
        "alltime_min": {k: round(v, 3) for k, v in alltime.items()},
        "policy": ("queries = floors at HEAD on a quiet host (min-of-N; unchanged "
                   "queries keep their old floor if lower). alltime_min = historical "
                   "minimum, archaeology only, never gated on. Re-floor (this script) "
                   "whenever a deliberate plan change lands, passing it via --changed."),
    }
    json.dump(out, open(base_path, "w"), indent=1, sort_keys=False)
    raised = [q for q in new_q if q in old_q and new_q[q] > old_q[q]]
    print(f"refloored {len(new_q)} queries; {len(raised)} floors raised (changed plans): "
          + ", ".join(f"{q} {old_q[q]}->{new_q[q]}" for q in sorted(raised)[:20]))

if __name__ == "__main__":
    main()
