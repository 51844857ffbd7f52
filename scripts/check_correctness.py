"""Driver-style correctness gate, runnable locally:

    python scripts/check_correctness.py [sf_dir]

Runs every `queries()` entry and its `oracle_sql()` side-by-side (like
the graft driver) and compares row count, column set, and
order-insensitive values.  Owns the Ray session (the library must
not).
"""

import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd
import ray


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v))
    return df.sort_values(cols).reset_index(drop=True)


def main(sf_dir: str) -> int:
    ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    report = {}
    for name, fn in queries.items():
        t0 = time.monotonic()
        try:
            out = fn(sf_dir)
            if hasattr(out, "to_pandas"):
                out = out.to_pandas()
            dt = time.monotonic() - t0
            sql = oracles.get(name)
            if sql is None:
                print(f"{name:22s} rows={len(out):7d}  {dt:6.2f}s  (no_oracle)")
                report[name] = {"rows": len(out), "sec": round(dt, 3), "oracle": False}
                continue
            odf = con.sql(sql).df()
            rows_ok = len(out) == len(odf)
            cols_ok = sorted(out.columns) == sorted(odf.columns)
            # The driver's value hash is dtype-sensitive (int vs float
            # hash differently even when values match) — flag kind
            # mismatches loudly so they're fixed before a driver run.
            kind_ok = True
            if cols_ok:
                for c in out.columns:
                    ka, kb = out[c].dtype.kind, odf[c].dtype.kind
                    if (ka in "iuf" or kb in "iuf") and (ka == "f") != (kb == "f"):
                        kind_ok = False
                        print(f"  !! dtype-kind mismatch col={c}: ray={out[c].dtype} oracle={odf[c].dtype}")
            vals_ok = False
            if rows_ok and cols_ok:
                a, b = _canon(out), _canon(odf)
                vals_ok = True
                for c in a.columns:
                    if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
                        # DuckDB list_cosine_similarity yields float32;
                        # the driver's value hash passed with this
                        # delta in r01, so mirror that tolerance
                        if not np.allclose(
                            a[c].astype(float), b[c].astype(float), rtol=0, atol=1e-6
                        ):
                            vals_ok = False
                    elif not (
                        a[c].astype(str).values == b[c].astype(str).values
                    ).all():
                        vals_ok = False
            status = "OK" if (rows_ok and cols_ok and vals_ok and kind_ok) else "FAIL"
            if status == "FAIL":
                failures.append(name)
            report[name] = {
                "rows": len(out), "oracle_rows": len(odf), "sec": round(dt, 3),
                "rows_match": rows_ok, "cols_match": cols_ok,
                "vals_match": vals_ok, "dtype_kind_match": kind_ok, "oracle": True,
            }
            print(
                f"{name:22s} rows={len(out):7d}/{len(odf):<7d} {dt:6.2f}s cols={cols_ok} "
                f"vals={vals_ok}  {status}"
            )
        except Exception as e:
            failures.append(name)
            report[name] = {"sec": round(time.monotonic() - t0, 3), "error": f"{type(e).__name__}: {e}"}
            print(f"{name:22s} ERROR {type(e).__name__}: {str(e)[:120]}")
    ray.shutdown()
    with open("/root/repo/CORRECTNESS_LOCAL.json", "w") as f:
        json.dump({"sf_dir": sf_dir, "n_queries": len(queries), "failures": failures, "report": report}, f, indent=1)
    slow = sorted(((v.get("sec", 0), k) for k, v in report.items()), reverse=True)[:15]
    print("SLOWEST:", [(k, s) for s, k in slow])
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
