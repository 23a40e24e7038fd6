#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for every query output parquet under <outDir>, executes the matching
oracle SQL (from <outDir>/oracle_sql.json) in DuckDB over the same
parquet tables, sorts columns by name + rows by all columns, and
compares values (exact for non-floats, tiny epsilon report for floats).

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    def keyfn(s):
        # nulls (None/NaN/NaT) sort first regardless of representation
        def one(v):
            if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
                return "[" + ",".join(str(x) for x in v) + "]"
            return "\x00" if pd.isna(v) else str(v)
        return s.map(one)
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True, key=keyfn)
    return df


def dtype_errs(got: pd.DataFrame, want: pd.DataFrame) -> list:
    """The driver hashes values exactly, so an oracle column that DuckDB
    promotes to HUGEINT (-> pandas float64/object) hash-mismatches a Spark
    int64 column even when every value is equal (e.g. 300000.0 vs 300000).
    Flag any column whose numeric kind differs between the two sides —
    this is the class that shipped red in rounds 6 and 7."""
    INT, FLT = set("iu"), set("f")
    errs = []
    for c in sorted(got.columns):
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        if (gk in INT and wk in FLT) or (gk in FLT and wk in INT):
            errs.append(
                f"DTYPE col {c}: spark={got[c].dtype} oracle={want[c].dtype} "
                f"(driver hashes exactly; cast the oracle, e.g. ::BIGINT)")
        elif wk == "O" and gk in INT | FLT:
            # DuckDB HUGEINT can also land as python-object ints
            sample = want[c].dropna()
            if len(sample) and not all(
                    isinstance(v, (int, float)) and not isinstance(v, bool)
                    for v in sample.head(20)):
                continue
            if len(sample) and gk in INT and any(
                    isinstance(v, float) for v in sample.head(20)):
                errs.append(
                    f"DTYPE col {c}: spark={got[c].dtype} oracle=object(float) "
                    f"(cast the oracle, e.g. ::BIGINT)")
    return errs


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list:
    errs = []
    if sorted(got.columns) != sorted(want.columns):
        return [f"columns differ: spark={sorted(got.columns)} oracle={sorted(want.columns)}"]
    if len(got) != len(want):
        return [f"row count differs: spark={len(got)} oracle={len(want)}"]
    errs.extend(dtype_errs(got, want))
    g, w = canon(got), canon(want)
    for c in g.columns:
        gc, wc = g[c], w[c]
        for i in range(len(g)):
            a, b = gc.iloc[i], wc.iloc[i]
            if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0 \
                    or isinstance(b, (list, tuple)) or str(type(b)).find("ndarray") >= 0:
                if list(a) != list(b):
                    errs.append(f"row {i} col {c}: {a!r} != {b!r}")
                    break
                continue
            if pd.isna(a) and pd.isna(b):
                continue
            if isinstance(a, float) or isinstance(b, float):
                try:
                    fa, fb = float(a), float(b)
                except (TypeError, ValueError):
                    errs.append(f"row {i} col {c}: {a!r} != {b!r}")
                    break
                if math.isnan(fa) and math.isnan(fb):
                    continue
                if fa != fb:
                    errs.append(f"row {i} col {c}: {fa!r} != {fb!r} (diff {abs(fa-fb):.3g})")
                    break
            elif a != b and str(a) != str(b):
                errs.append(f"row {i} col {c}: {a!r} != {b!r}")
                break
        if len(errs) >= 5:
            break
    return errs


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # testdata tables are single files; ScaleGen tables are Spark
        # part-file directories — glob the latter
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_weak = 0
    import glob
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p))
    for name in names:
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ok" if len(got) > 0 else "EMPTY"
            print(f"WEAK {name}: no oracle, rows={len(got)} [{status}]")
            n_weak += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        errs = compare(name, got, want)
        if errs:
            print(f"FAIL {name}:")
            for e in errs:
                print(f"   {e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
