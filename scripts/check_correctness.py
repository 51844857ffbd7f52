"""Driver-style correctness gate, runnable locally:

    python scripts/check_correctness.py [sf_dir]

Runs every `queries()` entry and its `oracle_sql()` side-by-side (like
the graft driver) and compares row count, column set, and
order-insensitive values.  Owns the Ray session (the library must
not).
"""

import sys

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
    for name, fn in queries.items():
        try:
            out = fn(sf_dir)
            if hasattr(out, "to_pandas"):
                out = out.to_pandas()
            sql = oracles.get(name)
            if sql is None:
                print(f"{name:22s} rows={len(out):7d}  (no_oracle)")
                continue
            odf = con.sql(sql).df()
            rows_ok = len(out) == len(odf)
            cols_ok = sorted(out.columns) == sorted(odf.columns)
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
            status = "OK" if (rows_ok and cols_ok and vals_ok) else "FAIL"
            if status == "FAIL":
                failures.append(name)
            print(
                f"{name:22s} rows={len(out):7d}/{len(odf):<7d} cols={cols_ok} "
                f"vals={vals_ok}  {status}"
            )
        except Exception as e:
            failures.append(name)
            print(f"{name:22s} ERROR {type(e).__name__}: {str(e)[:120]}")
    ray.shutdown()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
