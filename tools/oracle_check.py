#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB against <sf_dir>/*.parquet,
sorts columns by name and rows by all columns, and compares values.
Dev tool only — the engine itself never depends on DuckDB/pandas.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bytes, bytearray)):
            df[c] = df[c].apply(bytes)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(outdir: str, sfdir: str) -> int:
    import os
    con = duckdb.connect()
    for t in TABLES:
        # sf dirs ship single files; Spark-written corpora (the Amplify
        # 100x output) are DIRECTORIES of part files — glob those
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            failures += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failures += 1
            continue
        # Dtype-strict: the driver hashes typed values, so an int64 Spark
        # column vs a DuckDB HUGEINT->float64 promotion (the q63/q129 bug
        # class) must fail HERE, not at the driver's hash gate.  Both int
        # widths count as equal (the driver widens ints before hashing),
        # but int-vs-float is a real divergence.
        def kind(dt):
            s = str(dt)
            if s.startswith(("int", "uint", "Int", "UInt")):
                return "int"
            if s.startswith(("float", "Float")):
                return "float"
            if s.startswith("datetime"):
                return "datetime"
            return s
        dt_diffs = [f"{c}: {g[c].dtype} vs {w[c].dtype}"
                    for c in g.columns if kind(g[c].dtype) != kind(w[c].dtype)]
        if dt_diffs:
            print(f"FAIL {name}: dtype mismatch " + "; ".join(dt_diffs[:3]))
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            failures += 1
            continue
        diffs = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                    import numpy as np
                    # Signbit-strict (the q155 bug class): pandas equality
                    # treats -0.0 == +0.0 but the driver hashes raw bits,
                    # so DuckDB round() preserving IEEE -0.0 vs Spark's
                    # BigDecimal +0.0 must fail HERE.  NaN-safe: signbit
                    # only matters where both values are non-NaN equal.
                    av = a.astype("float64").to_numpy()
                    bv = b.astype("float64").to_numpy()
                    sign_diff = (np.signbit(av) != np.signbit(bv)) \
                        & ~(np.isnan(av) | np.isnan(bv))
                    bad = (~((a.isna() & b.isna()) | (a == b))) | pd.Series(sign_diff, index=a.index)
                else:
                    bad = ~((a.isna() & b.isna()) | (a.astype(object) == b.astype(object)))
                if bad.any():
                    i = bad.idxmax()
                    diffs.append(f"{c}[row {i}]: {a[i]!r} vs {b[i]!r} ({int(bad.sum())} diffs)")
            except Exception as e:
                diffs.append(f"{c}: compare error {e}")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:3]))
            failures += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
