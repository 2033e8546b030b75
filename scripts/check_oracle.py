#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB against the sfDir
tables, and compares values (columns sorted by name, rows sorted).
This script is a local development check only — the engine itself is
pure Scala/Spark.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints/floats
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def dtype_class(dt) -> str:
    """Coarse dtype class used for the STRICT pre-coercion check.

    The driver's hash compare is type/format-sensitive: a DuckDB HUGEINT
    (e.g. an uncast window sum over BIGINT) materializes through pandas
    as float64 and hash-fails against Spark's int64 even when every value
    is equal (round-8 p14/st23/e1). This check runs BEFORE canon()'s
    int64/float64 coercion so the local harness can never again launder
    an int-vs-float mismatch that the driver would reject.
    """
    k = dt.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "other"  # object: strings, arrays, structs


def dtype_strict(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> bool:
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
    ok = True
    for c in a.columns:
        if c not in b.columns:
            continue  # column mismatch reported by compare()
        ca, cb = dtype_class(a[c].dtype), dtype_class(b[c].dtype)
        if ca != cb:
            print(f"FAIL {name}: DTYPE-STRICT column {c}: spark {a[c].dtype} "
                  f"({ca}) vs oracle {b[c].dtype} ({cb}) — the driver's "
                  f"type-sensitive hash would reject this even if values match "
                  f"(cast the oracle SQL, e.g. ::BIGINT on window sums)")
            ok = False
    return ok


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> bool:
    if not dtype_strict(name, spark_df, oracle_df):
        return False
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
        return False
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
        return False
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if pd.api.types.is_float_dtype(a[c]):
            ok = all(
                (math.isnan(x) and math.isnan(y)) or x == y
                for x, y in zip(av, bv))
        else:
            ok = (pd.Series(av).fillna("__N__") == pd.Series(bv).fillna("__N__")).all()
        if not ok:
            bad = [(i, av[i], bv[i]) for i in range(len(av)) if str(av[i]) != str(bv[i])][:5]
            print(f"FAIL {name}: column {c} differs, first diffs {bad}")
            return False
    print(f"OK   {name} ({len(a)} rows)")
    return True


def selftest():
    """Prove the harness rejects the exact class that round 8 missed:
    an uncast DuckDB window sum (HUGEINT -> pandas float64) against a
    Spark int64 column with identical values."""
    con = duckdb.connect()
    uncast = con.execute(
        "SELECT i, sum(i) OVER (ORDER BY i) AS s FROM range(5) t(i)").fetchdf()
    cast = con.execute(
        "SELECT i, cast(sum(i) OVER (ORDER BY i) AS BIGINT) AS s "
        "FROM range(5) t(i)").fetchdf()
    engine = pd.DataFrame({"i": pd.array(range(5), dtype="int64"),
                           "s": pd.array([0, 1, 3, 6, 10], dtype="int64")})
    print("selftest 1: uncast HUGEINT window sum vs int64 engine (must FAIL)")
    assert not compare("selftest_uncast", engine, uncast), \
        "harness accepted an uncast HUGEINT window sum — dtype-strict check broken"
    print("selftest 2: cast BIGINT window sum vs int64 engine (must PASS)")
    assert compare("selftest_cast", engine, cast), \
        "harness rejected a correctly cast window sum"
    print("selftest OK: dtype-strict check catches HUGEINT->float64 laundering")
    sys.exit(0)


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
    partial = "--partial" in sys.argv[1:]
    args = [a for a in sys.argv[1:] if a != "--partial"]
    sf_dir, out_dir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        # scale dirs (target/sf1, target/sf10 from gen_sf1.py) carry only
        # the documents/embeddings/events tables — views are best-effort
        # so those dirs can be oracle-checked for the queries they cover
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception:
            pass
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # --partial: only check queries whose Spark output was dumped into
    # out_dir (a merged full-catalog oracle_sql.json against a
    # prefix-filtered Verify dump must not report the undumped rest as
    # failures) — and SAY what was skipped, a silent filter would let a
    # crashed full-catalog Verify run report "N ok, 0 failed" with
    # queries never verified. Default (no flag): a missing dump is a
    # FAIL, the full-catalog certification contract.
    import os
    if partial:
        skipped = sorted(n for n in oracles if not os.path.isdir(f"{out_dir}/{n}"))
        oracles = {n: s for n, s in oracles.items() if n not in skipped}
        if skipped:
            print(f"SKIP ({len(skipped)} not dumped, --partial): {', '.join(skipped)}")
    n_ok = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            oracle_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if compare(name, spark_df, oracle_df):
            n_ok += 1
        else:
            n_fail += 1
    print(f"\n{n_ok} ok, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
