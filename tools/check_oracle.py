"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf_dir and
compares against ``oracle_sql()`` via DuckDB: row count, column names
(sorted), order-insensitive exact values, AND per-column type families.
Stricter than a value hash — if this passes, any sane hash matches.

The type lint exists because the driver's value hash is type-sensitive:
DuckDB silently widens an uncast SUM to HUGEINT (int128) while Spark emits
int64, so two queries with bitwise-equal values can still hash-mismatch.
The exact-value compare alone is blind to that (Python ints compare equal
across widths); the lint maps both schemas into canonical families and
fails on any drift, HUGEINT/DECIMAL leaks included.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_type(t: str) -> str:
    """Map a Spark simpleString or DuckDB type name to a canonical family.

    Width-sensitive for integers on purpose: the driver's value hash sees
    the physical Arrow type, so int32-vs-int64 drift is as fatal as a
    HUGEINT leak. decimal keeps its own family so an uncast DuckDB SUM
    over DECIMAL can never lint-pass against a Spark double/bigint.
    """
    t = t.strip().lower()
    if t.endswith("[]"):
        return "array<" + canon_type(t[:-2]) + ">"
    if t.startswith("array<") and t.endswith(">"):
        return "array<" + canon_type(t[6:-1]) + ">"
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith("timestamp"):
        return "timestamp"
    return {
        "tinyint": "int8", "utinyint": "int8",
        "smallint": "int16", "usmallint": "int16",
        "int": "int32", "integer": "int32", "uinteger": "int32",
        "bigint": "int64", "ubigint": "int64", "long": "int64",
        "hugeint": "int128", "uhugeint": "int128",
        "float": "float32", "real": "float32",
        "double": "float64",
        "string": "str", "varchar": "str", "text": "str",
        "boolean": "bool", "bool": "bool",
        "date": "date",
    }.get(t, t)


def type_map_spark(sdf):
    return {f.name: canon_type(f.dataType.simpleString()) for f in sdf.schema.fields}


def type_map_duckdb(rel):
    return {c: canon_type(str(t)) for c, t in zip(rel.columns, rel.types)}


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from file_standardization_etl_spark.session import get_spark

    spark = get_spark(app_name="check-oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sorted(sdf.columns)
            s_rows = norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if sql is None:
            print(f"rows-only {name}: {len(s_rows)} rows, cols={s_cols}")
            continue
        try:
            rel = con.sql(sql)
            d_cols = sorted(rel.columns)
            d_types = type_map_duckdb(rel)
            d_rows = norm_rows(rel.columns, rel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if s_cols != d_cols:
            problems.append(f"cols spark={s_cols} duckdb={d_cols}")
        else:
            s_types = type_map_spark(sdf)
            drift = {
                c: (s_types[c], d_types[c])
                for c in s_types if s_types[c] != d_types.get(c)
            }
            if drift:
                problems.append(f"type drift {drift}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        elif s_rows != d_rows:
            diff = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
            problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK   {name}: {len(s_rows)} rows")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
