#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: selfcheck.py <sfDir> <verifyOutDir>

Reads each <name>.parquet under verifyOutDir (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB with the
sfDir parquet tables registered as views, sorts columns by name and rows
by value on both sides, and reports match/mismatch per query.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [c for c in sorted(cols)], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    ok = bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            bad += 1
            continue
        try:
            # Type audit first: a HUGEINT/UHUGEINT oracle output column is
            # gate-hostile — comparators that materialize through pandas
            # widen int128 to float64 ("6.0" vs Spark's "6"), which is
            # exactly how seven queries sat hash-red on the driver for two
            # rounds while fetchall()-based local checks stayed green.
            # (The probe_env_sum_uncast tripwire that CONFIRMED this from
            # the r09 gate is retired; this guard is the durable form.)
            rel = con.sql(sql)
            hostile = [c for c, t in zip(rel.columns, rel.types)
                       if str(t) in ("HUGEINT", "UHUGEINT")]
            if hostile:
                print(f"FAIL {name}: oracle emits gate-hostile int128 "
                      f"column(s) {hostile}: wrap in CAST(... AS BIGINT)")
                bad += 1
                continue
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            bad += 1
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: schema {gc} != {ec}")
            bad += 1
        elif gr != er:
            print(f"FAIL {name}: {len(gr)} rows vs {len(er)} rows; "
                  f"first diff: {next(((a, b) for a, b in zip(gr, er) if a != b), ('extra', 'rows'))}")
            bad += 1
        else:
            print(f"ok   {name} ({len(gr)} rows)")
            ok += 1
    print(f"== {ok} ok, {bad} fail ==")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
