"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare row
count, column names, and an order-insensitive value hash.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    """Exact-representation cell normalization. Floats use repr (shortest
    round-trip) so a last-ulp drift between Spark and DuckDB FAILS here the
    same way it fails the driver's stricter hasher — queries must produce
    bit-identical values (decimal accumulation), not merely close ones."""
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def norm_cell_hostile(v):
    """Hostile-harness normalization: the way a harness that round-trips
    results through pandas/str() would render cells — decimals collapse to
    floats, floats go through str(), datetimes through isoformat(). Queries
    must hash-match under BOTH normalizations (r2 lesson: the driver's
    hasher is NOT exact-repr; every DECIMAL-typed output column failed its
    gate while all double/bigint/timestamp columns passed)."""
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    return str(v)


def type_profile(rows, cols):
    """Per-column set of python cell types (None excluded). The driver
    hashes Spark and DuckDB results with ONE normalizer, so a column that
    arrives as Decimal on one side and float on the other renders
    differently even when values are equal — type parity is the invariant
    that keeps the gate portable across harness hashers."""
    prof = {c: set() for c in cols}
    for r in rows:
        for c, v in zip(cols, r):
            if v is not None:
                prof[c].add(type(v).__name__)
    return prof


def value_hash(rows, cols, norm=norm_cell):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm(r[i]) for i in order) for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import os

    # data-derived oracle constants (semantic-dedup quantizer) must come
    # from the same scale the DuckDB views read
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf

    import __spark_entry__ as entrymod
    from marie_ai_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in sqls:
            print(f"ok*   {name}: rows={len(srows)} (rows-only, no oracle)")
            continue
        try:
            res = con.sql(sqls[name])
            dcols = [c for c in res.columns]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        else:
            stup = [tuple(r) for r in srows]
            sh = value_hash(stup, scols)
            dh = value_hash(drows, dcols)
            sp, dp = type_profile(stup, scols), type_profile(drows, dcols)
            if sp != dp:
                diff = {
                    c: (sorted(sp[c]), sorted(dp[c]))
                    for c in sp
                    if sp[c] != dp[c]
                }
                problems.append(f"type divergence {diff}")
            hh_s = value_hash(stup, scols, norm_cell_hostile)
            hh_d = value_hash(drows, dcols, norm_cell_hostile)
            if sh == dh and hh_s != hh_d:
                problems.append("hostile-normalization hash mismatch")
            if sh != dh:
                problems.append("value hash mismatch")
                # show a diff sample
                so = sorted(
                    "\x1f".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in [tuple(x) for x in srows]
                )
                do = sorted(
                    "\x1f".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(dcols)), key=lambda i: dcols[i])
                    )
                    for r in drows
                )
                for a, b in zip(so, do):
                    if a != b:
                        problems.append(f"  spark: {a[:160]}")
                        problems.append(f"  duck : {b[:160]}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("      " + p)
            failures += 1
        else:
            print(f"ok    {name}: rows={len(srows)} hash match")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
