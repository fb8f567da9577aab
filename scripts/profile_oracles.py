#!/usr/bin/env python3
"""Per-oracle cost profiler: run each DuckDB oracle from a Verify dump's
oracle_sql.json in a FRESH subprocess with a VANILLA duckdb connection (no
threads/memory_limit/temp_directory overrides — exactly what a default
driver harness does) and a wall-clock timeout, and report the cost ranking.

The round-12 gate: every oracle must finish on a vanilla connection fast
enough that the whole sf0.1 sweep fits in <10 min. This script is how we
find (and later re-verify) the offenders.

Usage: python3 scripts/profile_oracles.py <sfDir> <verifyOutDir> [timeout_s] [query ...]
"""
import json, os, subprocess, sys, time

RUNNER = r'''
import duckdb, json, os, sys, time
sf_dir, sql = sys.argv[1], sys.stdin.read()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
t0 = time.time()
n = len(con.execute(sql).fetchall())
print(json.dumps({"rows": n, "sec": round(time.time() - t0, 2)}))
'''

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    only = set(sys.argv[4:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = []
    for name in sorted(oracles):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", RUNNER, sf_dir],
                               input=oracles[name], capture_output=True,
                               text=True, timeout=timeout)
            wall = time.time() - t0
            if r.returncode != 0:
                # OOM-killed children (the exact overload this profiler
                # hunts) die with empty stderr — don't crash the sweep
                lines = r.stderr.strip().splitlines() or [f"exit {r.returncode}"]
                status = "ERR: " + lines[-1][:120]
            else:
                status = r.stdout.strip()
        except subprocess.TimeoutExpired:
            wall, status = time.time() - t0, f"TIMEOUT>{timeout:.0f}s"
        results.append((wall, name, status))
        print(f"{wall:8.1f}s  {name:40s} {status}", flush=True)
    print("\n=== ranking (slowest first) ===")
    for wall, name, status in sorted(results, reverse=True)[:20]:
        print(f"{wall:8.1f}s  {name:40s} {status}")
    total = sum(w for w, _, _ in results)
    print(f"\ntotal wall (sequential, incl. subprocess spawn): {total:.0f}s "
          f"for {len(results)} oracles")

if __name__ == "__main__":
    main()
