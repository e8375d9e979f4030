#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet result written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, then
compares after sorting columns by name (like the driver). Reports per-query
match / mismatch with a sample diff.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(got)} ok={len(got) > 0}"
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g, w = norm(got.copy()), norm(want.copy())
        if list(g.columns) != list(w.columns):
            results[name] = f"SCHEMA_MISMATCH got={list(g.columns)} want={list(w.columns)}"
            continue
        # The driver's hash gate stringifies values, so int width doesn't
        # matter (int32's "100" == int64's "100") but dtype KIND does:
        # DuckDB HUGEINT (SUM of BIGINT) lands in pandas as float64/object,
        # rendering "100.0" against Spark's "100" — hash mismatch the
        # epsilon compare below would mask. Flag cross-kind pairs.
        def kind(s):
            if pd.api.types.is_bool_dtype(s): return "bool"
            if pd.api.types.is_integer_dtype(s): return "int"
            if pd.api.types.is_float_dtype(s): return "float"
            # unit differences (ns vs us, DuckDB-version-dependent) don't
            # affect the stringified compare the driver hashes — but
            # tz-awareness DOES (a tz drift must stay visible as a dtype
            # error, not hide behind a lucky string match)
            if pd.api.types.is_datetime64_any_dtype(s):
                tz = getattr(s.dtype, "tz", None)
                return f"datetime[tz={tz}]" if tz is not None else "datetime"
            return str(s.dtype)
        dt_bad = [
            f"{c}: spark={g[c].dtype} duckdb={w[c].dtype}" for c in g.columns
            if kind(g[c]) != kind(w[c])]
        if dt_bad:
            results[name] = "DTYPE_MISMATCH " + "; ".join(dt_bad)
            continue
        if len(g) != len(w):
            results[name] = f"ROWCOUNT_MISMATCH got={len(g)} want={len(w)}"
            continue
        bad = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    eq = ((a - b).abs() < 1e-9) | (a.isna() & b.isna())
                else:
                    eq = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
                if not eq.all():
                    i = (~eq).idxmax()
                    bad.append(f"{c}[{i}]: got={a[i]!r} want={b[i]!r}")
            except Exception as e:
                bad.append(f"{c}: compare error {e}")
        results[name] = "MATCH" if not bad else "VALUE_MISMATCH " + "; ".join(bad[:3])
    width = max(len(k) for k in results)
    n_ok = 0
    for k, v in sorted(results.items()):
        ok = v == "MATCH" or v.startswith("ROWS_ONLY") and "ok=True" in v
        n_ok += ok
        print(f"{'OK ' if ok else 'FAIL'} {k:<{width}} {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
