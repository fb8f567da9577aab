#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracles and diff row-by-row. Dev tool only (driver-side
python env) — the Scala library never depends on this.

Every registered query now carries a real SQL oracle (round 13 converted
the last two approx twins — table_profile_approx and sketch_event_stats —
to deterministic KMV bottom-k sketches whose estimates replay exactly in
DuckDB; model_feature_importance graduated via serialized gain stats), so
this is a pure hash-compare gate with no bounded side-checks left. The
error-vs-exact bounds those side-checks asserted live on as ScalaTest
specs (ProfileSpec, SketchSpec, KmvSpec).

Writes CHECK_LOCAL.json beside the dumps: per-query status + summary, the
builder-committed counterpart of the driver's CORRECTNESS artifact (the
round-10 driver artifact landed empty; this one can't vanish with the host).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, struct, sys, glob, os
import duckdb

def canon(v):
    """Bit-exact float canonicalization: the driver hashes raw value bits, so
    -0.0 != 0.0 and NaN == NaN must hold here too (Python == gets both wrong)."""
    if isinstance(v, float):
        return struct.pack('>d', v)
    if isinstance(v, list):
        return [canon(x) for x in v]
    if isinstance(v, dict):
        return {k: canon(x) for k, x in v.items()}
    return v

def read_dump(con, out_dir, name):
    files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
    if not files:
        return None
    return con.execute(f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def fresh_con(sf_dir):
    """One VANILLA connection per oracle — no threads / memory_limit /
    temp_directory overrides, exactly what a default driver harness gets.
    Round 11 needed tuned settings (8 threads + 48 GB + spill dir) because
    DuckDB's default CTE inlining re-expanded the shared feature chains per
    reference — the 11-strategy signal union replayed the recursive EWM CTE
    11×, and CTEs referenced inside recursive members (bars `b`, signal
    table `sw`) were re-evaluated PER ITERATION, so the six simulation-based
    oracles each burned >90 s and thrashed at 32 threads. Round 12 fixed
    that structurally with `AS MATERIALIZED` on every multi-referenced /
    recursion-input CTE (OracleSql.barsCte, SignalQueries.featCte,
    BacktestQueries.simCte, MlQueries.mlFeatureCtes, the CC `sym` tables):
    measured 90 s+ → <1 s each, whole sf0.1 sweep <5 min on defaults.
    Per-query isolation stays: one pathological plan can only fail itself."""
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = fresh_con(sf_dir)
    n_pass = n_fail = n_bounded = 0
    statuses = {}
    def record(name, status, detail=""):
        statuses[name] = {"status": status, **({"detail": detail} if detail else {})}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            print(f"[MISS] {name}: no parquet written"); n_fail += 1
            record(name, "miss"); continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        if name not in oracles:
            print(f"[ROWS] {name}: rows={got.num_rows} (no oracle)")
            record(name, "rows-only", f"rows={got.num_rows}")
            continue
        try:
            qcon = fresh_con(sf_dir)
            try:
                want = qcon.execute(oracles[name]).fetch_arrow_table()
            finally:
                qcon.close()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}"); n_fail += 1
            record(name, "oracle-err", str(e)[:300]); continue
        gcols, wcols = sorted(got.column_names), sorted(want.column_names)
        if gcols != wcols:
            print(f"[SCHEMA] {name}: spark={gcols} duck={wcols}"); n_fail += 1
            record(name, "schema-mismatch"); continue
        g = got.select(gcols).to_pylist()
        w = want.select(wcols).to_pylist()
        if len(g) != len(w):
            print(f"[ROWCOUNT] {name}: spark={len(g)} duck={len(w)}"); n_fail += 1
            record(name, "rowcount-mismatch", f"spark={len(g)} duck={len(w)}"); continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if canon(a) != canon(b)]
        if bad:
            i, a, b = bad[0]
            diffk = [k for k in a if canon(a[k]) != canon(b[k])]
            print(f"[VALUES] {name}: {len(bad)}/{len(g)} rows differ; first row {i} keys {diffk}")
            print(f"   spark: {{ {', '.join(f'{k}: {a[k]!r}' for k in diffk[:6])} }}")
            print(f"   duck : {{ {', '.join(f'{k}: {b[k]!r}' for k in diffk[:6])} }}")
            n_fail += 1
            record(name, "values-mismatch", f"{len(bad)}/{len(g)} rows, keys {diffk[:6]}")
        else:
            print(f"[OK] {name}: {len(g)} rows"); n_pass += 1
            record(name, "ok", f"rows={len(g)}")
    print(f"\n{n_pass} ok, {n_bounded} bounded-ok, {n_fail} failed")
    # only a FULL sweep writes the committed artifact — a single-query dev
    # run must never clobber the round's correctness record
    if not only:
        with open(os.path.join(out_dir, "CHECK_LOCAL.json"), "w") as f:
            json.dump({"sf": sf_dir, "n_ok": n_pass, "n_bounded_ok": n_bounded,
                       "n_fail": n_fail, "queries": statuses}, f, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
