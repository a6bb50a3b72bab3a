#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver:
run Verify.scala output (parquet per query) against DuckDB running
oracle_sql.json on the same sf tables; compare value-exact after
sorting columns by name and rows by value.

Usage: python3 tools/check.py <sfdir> <verify_outdir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            continue
        got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(grows)} rows")
            continue
        try:
            exp = con.execute(oracles[name])
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"[FAIL-sql ] {name}: oracle errored: {e}")
            n_bad += 1
            continue
        gtypes = sorted((d[0], str(d[1])) for d in got.description)
        etypes = sorted((d[0], str(d[1])) for d in exp.description)
        gc, gr = canon(gcols, grows)
        ec, er = canon(ecols, erows)
        if gc != ec:
            print(f"[FAIL-cols] {name}: spark={gc} duckdb={ec}")
            n_bad += 1
        elif gtypes != etypes:
            print(f"[FAIL-type] {name}: spark={gtypes} duckdb={etypes}")
            n_bad += 1
        elif gr != er:
            n_bad += 1
            diff = [(a, b) for a, b in zip(gr, er) if a != b]
            only_g = [r for r in gr if r not in set(map(tuple, er))][:3]
            only_e = [r for r in er if r not in set(map(tuple, gr))][:3]
            print(f"[FAIL-rows] {name}: spark_rows={len(gr)} duck_rows={len(er)} "
                  f"first_diffs={diff[:2]} only_spark={only_g[:2]} only_duck={only_e[:2]}")
        else:
            n_ok += 1
            print(f"[ok       ] {name}: {len(gr)} rows")
    print(f"== {n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
