#!/usr/bin/env python3
"""Mechanical oracle-typing audit: the round-13 driver red (corpus_version_diff)
was a single uncast SUM whose DuckDB type (HUGEINT) diverged from Spark's
BIGINT — rows and schema coerced, but the driver's VALUE hash is typed, so the
query failed while check.py's lenient pylist compare stayed green. This script
closes that gap for good: for every registered oracle it compares the DuckDB
result's arrow schema against the Spark dump's arrow schema COLUMN BY COLUMN
and fails on any pair outside the explicitly-coercible set.

Hard-fail pairs (would or could break the driver's typed value hash):
  - any DuckDB HUGEINT/UHUGEINT output (Spark cannot produce one — always an
    uncast SUM/aggregate in the oracle; the §6 convention is CAST(... AS BIGINT));
  - any cross-family mismatch (int vs float vs decimal vs string vs bool);
  - decimal outputs with different (precision, scale).
Coercible (observed green across 157 driver-checked queries): integer width
(int32 vs int64), float32 vs float64, string vs large_string, timestamp unit,
date32 vs date64.

Usage: python3 scripts/oracle_audit.py <sfDir> <verifyOutDir>
Run after Verify has produced <verifyOutDir>/oracle_sql.json + per-query dumps.
"""
import glob
import json
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def family(t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<%s>" % family(t.value_type)
    return str(t)


def is_hugeint(t: pa.DataType) -> bool:
    # duckdb's arrow export maps HUGEINT to decimal128(38,0) (and UHUGEINT
    # similarly); no graft oracle legitimately outputs a 38,0 decimal
    return pa.types.is_decimal(t) and t.precision == 38 and t.scale == 0


def check_pair(spark_t: pa.DataType, duck_t: pa.DataType):
    """Returns None when coercible, else a reason string."""
    if is_hugeint(duck_t):
        return "oracle emits HUGEINT (uncast aggregate?) vs spark %s" % spark_t
    fs, fd = family(spark_t), family(duck_t)
    if fs != fd:
        return "family mismatch: spark %s (%s) vs duck %s (%s)" % (spark_t, fs, duck_t, fd)
    if fs == "decimal" and (spark_t.precision, spark_t.scale) != (duck_t.precision, duck_t.scale):
        return "decimal shape: spark %s vs duck %s" % (spark_t, duck_t)
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_bad = n_ok = 0
    for name in sorted(oracles):
        files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not files:
            # partial dev runs dump a subset; completeness is check.py's job
            continue
        spark_schema = pq.read_schema(files[0])
        try:
            duck_schema = con.execute(
                f"SELECT * FROM ({oracles[name]}) LIMIT 0").fetch_arrow_table().schema
        except Exception as e:  # noqa: BLE001 - report any oracle failure
            print(f"[ORACLE-ERR] {name}: {e}")
            n_bad += 1
            continue
        problems = []
        for col in sorted(spark_schema.names):
            if col not in duck_schema.names:
                continue  # column-set mismatch is check.py's job
            reason = check_pair(spark_schema.field(col).type, duck_schema.field(col).type)
            if reason:
                problems.append(f"{col}: {reason}")
        if problems:
            print(f"[TYPE] {name}: " + "; ".join(problems))
            n_bad += 1
        else:
            n_ok += 1
    print(f"\noracle_audit: {n_ok} ok, {n_bad} flagged")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
