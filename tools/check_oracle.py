#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [<verifyOutDir2>]

Reads each <verifyOutDir>/<name>/ parquet dump (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB against views
named after the testdata tables, and compares: row count, column
names/dtypes, and a VALUE HASH (columns sorted by name, rows sorted by
all columns, every cell rendered with repr so float bits matter — the
same comparison shape the driver's hash_match uses). Exit 1 on any
mismatch.

DETERMINISM GATE (round-6 lesson): a query whose output depends on
Spark's partition/summation order can pass a local compare and fail the
driver's (CORRECTNESS_r06: ann_refined). Pass a SECOND verify dir,
produced by a run at a DIFFERENT parallelism (e.g. SPARK_GRAFT_CPUS=32
vs 4), and every query is additionally checked dump-vs-dump for an
IDENTICAL value hash. A local correctness claim is only driver-safe when
both gates pass — see BASELINE.md "Verification protocol".
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    import datetime
    df = df.reindex(sorted(df.columns), axis=1)
    # parquet DATE may surface as object-of-datetime.date on one side and
    # datetime64 on the other depending on reader version — unify first
    for c in df.columns:
        if df[c].dtype == object and len(df):
            v = df[c].dropna()
            if len(v) and all(isinstance(x, datetime.date)
                              and not isinstance(x, datetime.datetime) for x in v):
                df[c] = pd.to_datetime(df[c])
    # unify datetime resolution/tz: everything → naive datetime64[us]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            s = df[c]
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
    # normalize list/array cells to tuples BEFORE sorting — numpy arrays
    # are unhashable and break sort_values/factorize
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              (hasattr(v, "__len__") and not isinstance(v, (str, bytes))) else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    """Order-canonical hash of every cell value. repr() preserves full
    float precision (repr round-trips doubles, and distinguishes -0.0
    from 0.0 — the r6 driver divergence pandas equality masked). Dtype
    parity is checked SEPARATELY and must fail first: repr renders a
    float32 and float64 1.5 identically, so the hash alone is blind to
    physical-type drift."""
    h = hashlib.sha256()
    for row in df.itertuples(index=False, name=None):
        h.update(repr(row).encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    alt_dir = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    failures = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output"); failures += 1; continue
        got = pd.read_parquet(os.path.join(out_dir, name))
        if alt_dir is not None:
            # determinism gate: same query, different-parallelism run
            alt_path = os.path.join(alt_dir, name)
            if not os.path.isdir(alt_path):
                print(f"FAIL {name}: missing from determinism dir {alt_dir}")
                failures += 1; continue
            alt = pd.read_parquet(alt_path)
            hg, ha = value_hash(norm(got)), value_hash(norm(alt))
            if hg != ha:
                print(f"FAIL {name}: NONDETERMINISTIC across parallelism "
                      f"({hg[:12]} vs {ha[:12]}) — would flake the driver gate")
                failures += 1; continue
        if name not in oracle:
            print(f"WEAK {name}: no oracle sql, rows={len(got)} "
                  f"({'ok' if len(got) > 0 else 'EMPTY!'})")
            if len(got) == 0: failures += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); failures += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} duck={list(e.columns)}")
            failures += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} duck={len(e)}")
            failures += 1; continue
        dt_mismatch = [(c, str(g[c].dtype), str(e[c].dtype))
                       for c in g.columns if str(g[c].dtype) != str(e[c].dtype)]
        if dt_mismatch:
            # hard fail: repr collapses float32/float64 (both render 1.5),
            # so the hash alone would pass a dump whose physical types the
            # driver's schema gate rejects — dtype parity is part of the gate
            print(f"FAIL {name}: dtype mismatch {dt_mismatch}")
            failures += 1; continue
        eq = value_hash(g) == value_hash(e)
        if not eq:
            # cell-level diff report
            bad = []
            for c in g.columns:
                if not g[c].equals(e[c]):
                    mask = ~(g[c] == e[c])
                    try:
                        mask = mask | (g[c].isna() != e[c].isna())
                    except Exception:
                        pass
                    idx = list(g.index[mask])[:3]
                    bad.append((c, [(i, g[c][i], e[c][i]) for i in idx]))
            if not bad:
                # the pandas mask follows IEEE equality (-0.0 == 0.0) and
                # is blind to the float-bit drift the repr hash catches —
                # fall back to a repr-level per-cell compare so the report
                # always names the diverging column/rows
                for c in g.columns:
                    gr, er = g[c].map(repr), e[c].map(repr)
                    idx = [i for i in g.index if gr[i] != er[i]][:3]
                    if idx:
                        bad.append((c, [(i, gr[i], er[i]) for i in idx]))
            print(f"FAIL {name}: value mismatch {bad[:2]}")
            failures += 1; continue
        print(f"OK   {name}: rows={len(g)}")
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
