#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (Spark results) and
<verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB over views of the
parquet tables in <sfDir>, and compares: column set (sorted by name),
row count, and exact values after sorting rows. Reports per-query status.
"""
import sys, json, glob, math, zlib

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Queries whose oracle needs a scalar DuckDB lacks. q59's deflate byte
# count is pure zlib: CPython's zlib at level 6 and the JVM's
# Deflater(6) wrap the SAME canonical zlib (default strategy, 32 KiB
# window), so the byte counts are identical — verified 500/500 docs at
# sf0.01. This gives q59 a full rows+schema+hash gate locally; the
# driver's pure-SQL harness can't register UDFs, so there it stays a
# rows-only check (DuckDB 1.0.0 ships no deflate scalar — see
# duckdb_functions()).
EXTRA_ORACLES = {
    "q59_compression_ratio": """
        SELECT doc_id, CAST(strlen(text) AS BIGINT) AS raw_bytes,
          deflate_size(text) AS comp_bytes,
          round(deflate_size(text) * 1.0 / strlen(text), 6) AS ratio
        FROM documents ORDER BY doc_id"""
}


def deflate_size(t: str) -> int:
    c = zlib.compressobj(6)
    return len(c.compress(t.encode("utf-8")) + c.flush())


# The q59 byte-identity gate assumes the local CPython links canonical
# (madler) zlib, like the JVM's Deflater. A CPython built against
# zlib-ng emits different (still valid) deflate streams at level 6, so
# the gate would report value mismatches that are an ENVIRONMENT
# artifact, not a correctness bug. Canary: this probe string deflates
# to exactly 80 bytes under both canonical zlib and JVM Deflater(6)
# (measured 2026-08-14, Java 17 Deflater + CPython zlib 1.2.13).
_ZLIB_PROBE = ("graft zlib canary: the quick brown fox jumps over the "
               "lazy dog 0123456789 the quick brown fox jumps over the lazy dog")
_ZLIB_PROBE_JVM_BYTES = 80


def zlib_is_canonical() -> bool:
    return deflate_size(_ZLIB_PROBE) == _ZLIB_PROBE_JVM_BYTES


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and format compactly
        if v == 0:
            return "0"
        return repr(v)
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    con.create_function("deflate_size", deflate_size,
                        [duckdb.typing.VARCHAR], duckdb.typing.BIGINT)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if zlib_is_canonical():
        for name, sql in EXTRA_ORACLES.items():
            if glob.glob(f"{out_dir}/{name}/*.parquet"):
                oracle[name] = sql
    else:
        print("WARN local zlib is not canonical (probe deflates to "
              f"{deflate_size(_ZLIB_PROBE)} bytes, expected "
              f"{_ZLIB_PROBE_JVM_BYTES}, likely zlib-ng) — skipping the "
              "byte-identity oracles: " + ", ".join(sorted(EXTRA_ORACLES)))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns differ oracle={ocols} spark={scols}")
            n_bad += 1
            continue
        orows = sorted(tuple(norm(v) for v in r)
                       for r in odf[ocols].itertuples(index=False))
        srows = sorted(tuple(norm(v) for v in r)
                       for r in sdf[ocols].itertuples(index=False))
        if len(orows) != len(srows):
            print(f"FAIL {name}: rowcount oracle={len(orows)} spark={len(srows)}")
            n_bad += 1
            continue
        diffs = [(a, b) for a, b in zip(orows, srows) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)}/{len(orows)} rows differ; first: "
                  f"oracle={diffs[0][0]} spark={diffs[0][1]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(orows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
