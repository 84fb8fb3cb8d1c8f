"""Local mirror of the driver's correctness gate: run every
__spark_entry__ query on Spark AND its DuckDB oracle at the given sf dir,
compare row count + column set + values (exact after the query's own
rounding).  Usage: python scripts/check_entry.py [sf_dir] [name ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from hipporag_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def compare(name, sdf, odf):
    issues = []
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return [f"columns differ: spark={scols} oracle={ocols}"]
    if len(sdf) != len(odf):
        issues.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    o = odf[scols].sort_values(scols).reset_index(drop=True)
    if len(s) == len(o):
        for c in scols:
            sv, ov = s[c], o[c]
            if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
                a = sv.astype(float).to_numpy()
                b = ov.astype(float).to_numpy()
                both_nan = np.isnan(a) & np.isnan(b)
                neq = ~both_nan & (a != b)
                if neq.any():
                    d = np.nanmax(np.abs(a[neq] - b[neq]))
                    issues.append(f"col {c}: {neq.sum()} value diffs, max |Δ|={d:.3g}")
            else:
                neq = (sv.astype(str) != ov.astype(str)) & ~(sv.isna() & ov.isna())
                if neq.any():
                    i = neq.idxmax()
                    issues.append(
                        f"col {c}: {neq.sum()} diffs, first: spark={sv[i]!r} oracle={ov[i]!r}"
                    )
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-entry", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows [{time.time()-t0:.1f}s] cols={list(sdf.columns)}")
            n_pass += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        issues = compare(name, sdf, odf)
        if issues:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]: " + "; ".join(issues))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
