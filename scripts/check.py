#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracles and diff row-by-row. Dev tool only (driver-side
python env) — the Scala library never depends on this.

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

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            print(f"[MISS] {name}: no parquet written"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        if name not in oracles:
            print(f"[ROWS] {name}: rows={got.num_rows} (no oracle)"); continue
        try:
            want = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}"); n_fail += 1; continue
        gcols, wcols = sorted(got.column_names), sorted(want.column_names)
        if gcols != wcols:
            print(f"[SCHEMA] {name}: spark={gcols} duck={wcols}"); n_fail += 1; continue
        g = got.select(gcols).to_pylist()
        w = want.select(wcols).to_pylist()
        if len(g) != len(w):
            print(f"[ROWCOUNT] {name}: spark={len(g)} duck={len(w)}"); n_fail += 1; continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if canon(a) != canon(b)]
        if bad:
            i, a, b = bad[0]
            diffk = [k for k in a if canon(a[k]) != canon(b[k])]
            print(f"[VALUES] {name}: {len(bad)}/{len(g)} rows differ; first row {i} keys {diffk}")
            print(f"   spark: {{ {', '.join(f'{k}: {a[k]!r}' for k in diffk[:6])} }}")
            print(f"   duck : {{ {', '.join(f'{k}: {b[k]!r}' for k in diffk[:6])} }}")
            n_fail += 1
        else:
            print(f"[OK] {name}: {len(g)} rows"); n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
