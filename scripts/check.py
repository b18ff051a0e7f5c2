#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (t2).

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out

Reads each Spark-written parquet under <outdir>/<query>/ and compares it,
column-names-sorted, exact-value, against the DuckDB run of the matching
oracle SQL over the same fixture parquet.
"""
import sys, json, math, datetime, os
import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day)
    try:
        import numpy as np
        if isinstance(v, np.generic):
            return v.item()
    except ImportError:
        pass
    return v


def compare(got, exp):
    g = got[sorted(got.columns)]
    e = exp[sorted(exp.columns)]
    if list(g.columns) != list(e.columns):
        return f"columns {list(g.columns)} vs {list(e.columns)}"
    if len(g) != len(e):
        return f"rows {len(g)} vs {len(e)}"
    for c in g.columns:
        gv = [norm(x) for x in g[c].tolist()]
        ev = [norm(x) for x in e[c].tolist()]
        for i, (a, b) in enumerate(zip(gv, ev)):
            if a != b:
                return (f"col {c} row {i}: {a!r} != {b!r} "
                        f"(dtypes {g[c].dtype} vs {e[c].dtype})")
        if str(g[c].dtype) != str(e[c].dtype):
            return f"DTYPE col {c}: {g[c].dtype} vs {e[c].dtype} (values equal)"
    return None


def main(sfdir, outdir, names=()):
    con = duckdb.connect()
    for t in TABLES:
        # Driver fixtures are single files; GenSf1 decades are Spark
        # directory-layout parquet — glob the parts in that case so the
        # oracle can run at any generated scale.
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if names:
        # A typo'd name would otherwise filter to zero queries and exit
        # green without checking anything — fail loudly instead.
        missing = sorted(set(names) - set(oracle))
        if missing:
            raise SystemExit(f"unknown query name(s): {', '.join(missing)}")
        oracle = {k: v for k, v in oracle.items() if k in set(names)}
    nfail = 0
    for name in sorted(oracle):
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
            exp = con.execute(oracle[name]).df()
            err = compare(got, exp)
        except Exception as exc:
            err = f"EXCEPTION {type(exc).__name__}: {exc}"
        if err:
            nfail += 1
            print(f"FAIL {name}: {err}")
        else:
            print(f"ok   {name}")
    print(f"{len(oracle) - nfail}/{len(oracle)} passed")
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
