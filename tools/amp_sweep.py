#!/usr/bin/env python3
"""100x amplified-corpus hash sweep (dev tool, round 10).

Like oracle_check.py, but built for the amplified corpus where some
oracle SQLs are legitimately prohibitive for DuckDB (recursive CC
closures, whole-vocabulary LM fits): each oracle runs in a child
process under a wall-clock timeout and the sweep records OK / MISMATCH
/ TIMEOUT / ERROR per query instead of failing the whole run. A
MISMATCH is a real scale-dependent divergence (the class that produced
the q81 signed-zero and q235 window-shard findings); a TIMEOUT is a
DuckDB cost statement, not an engine defect (the Spark side already
wrote its result).

Usage: python3 tools/amp_sweep.py <verify_out_dir> <amp_dir> [timeout_s] [only...]
"""
import json
import multiprocessing as mp
import os
import sys

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bytes, bytearray)):
            df[c] = df[c].apply(bytes)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def run_one(name, sql, outdir, sfdir, q):
    import duckdb
    import numpy as np
    import pandas as pd
    try:
        con = duckdb.connect()
        for t in TABLES:
            path = f"{sfdir}/{t}.parquet"
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        got = pd.read_parquet(f"{outdir}/{name}")
        want = con.execute(sql).df()
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            q.put((name, "MISMATCH", f"columns {list(g.columns)} vs {list(w.columns)}"))
            return
        if len(g) != len(w):
            q.put((name, "MISMATCH", f"rows {len(g)} vs {len(w)}"))
            return
        for c in g.columns:
            a, b = g[c].to_numpy(), w[c].to_numpy()
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                af, bf = a.astype(float), b.astype(float)
                same = (np.isnan(af) & np.isnan(bf)) | (af == bf)
                # the driver's hash sees the sign bit: signbit-strict
                sb = np.signbit(af) == np.signbit(bf)
                if not bool((same & (sb | np.isnan(af))).all()):
                    i = int(np.argmin(same & (sb | np.isnan(af))))
                    q.put((name, "MISMATCH", f"col {c} row {i}: {af[i]!r} vs {bf[i]!r}"))
                    return
            else:
                # object-level compare (the oracle_check convention):
                # int64 vs int32 with equal values is NOT a divergence
                ga, wb = g[c], w[c]
                bad = ~((ga.isna() & wb.isna())
                        | (ga.astype(object) == wb.astype(object)))
                if bool(bad.any()):
                    i = bad.idxmax()
                    q.put((name, "MISMATCH",
                           f"col {c} row {i}: {ga[i]!r} vs {wb[i]!r}"))
                    return
        q.put((name, "OK", f"{len(g)} rows"))
    except Exception as e:  # noqa: BLE001
        q.put((name, "ERROR", str(e)[:200]))


def main(outdir, sfdir, timeout_s=180, only=()):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in set(only)}
    counts = {"OK": 0, "MISMATCH": 0, "TIMEOUT": 0, "ERROR": 0, "NO_OUTPUT": 0}
    for name, sql in sorted(oracle.items()):
        if not os.path.exists(f"{outdir}/{name}"):
            print(f"NO_OUTPUT {name}")
            counts["NO_OUTPUT"] += 1
            continue
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(name, sql, outdir, sfdir, q))
        p.start()
        p.join(timeout_s)
        if p.is_alive():
            p.terminate()
            p.join()
            print(f"TIMEOUT  {name} (> {timeout_s}s in DuckDB)")
            counts["TIMEOUT"] += 1
            continue
        try:
            _, status, detail = q.get_nowait()
        except Exception:  # noqa: BLE001
            status, detail = "ERROR", "child died without reporting"
        print(f"{status:8s} {name} ({detail})")
        counts[status] += 1
        sys.stdout.flush()
    print(json.dumps(counts))
    return 0 if counts["MISMATCH"] == 0 and counts["ERROR"] == 0 else 1


if __name__ == "__main__":
    to = int(sys.argv[3]) if len(sys.argv) > 3 else 180
    sys.exit(main(sys.argv[1], sys.argv[2], to, sys.argv[4:]))
