#!/usr/bin/env python3
"""Local replay of the driver's correctness gate.

Usage: python3 tools/verify_local.py [sf_dir] [out_dir] [--skip-spark]
           [--oracle-timeout SEC]

1. sbt "runMain graft.Verify <sf_dir> <out_dir>"  (unless --skip-spark)
2. For each query result parquet in <out_dir>, run the matching oracle
   SQL from oracle_sql.json in DuckDB (views over the sf parquet) and
   compare: columns sorted by name, rows sorted, values stringified.

--oracle-timeout N interrupts any single oracle that runs longer than
N seconds and reports it as TIMEOUT (counted separately, non-fatal):
some QC oracles are deliberately quadratic ground truths that are
tractable at the gate's sf0.01 but not at a 100x replay sf — a scale
replay wants them skipped loudly, not hung. Default: no timeout (the
sf0.01 gate must check every oracle).
"""
import json
import re
import subprocess
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Oracle result-type contract. The driver hashes both sides through a
# typed (arrow/pandas) materialization, where DuckDB types outside
# this set convert lossily or inconsistently vs Spark's parquet: the
# r12-r14 a12_kmv_rolling hash-red (three rounds) was a single uncast
# sum(BIGINT) -> HUGEINT/INT128 column whose values were equal but
# whose typed hash was not. Every oracle's result schema must stay
# inside this set; the guard turns the next uncast integer sum() into
# a local failure instead of a red round. (Empirical sweep at the
# guard's birth: the 153 oracles emit only BIGINT/DOUBLE/VARCHAR/
# INTEGER/BOOLEAN; the rest of the set is the compare's known-safe
# headroom -- DECIMAL capped at precision 18 because DuckDB stores
# wider decimals as INT128.)
ALLOWED_ORACLE_TYPE = re.compile(
    r"^(BOOLEAN|TINYINT|SMALLINT|INTEGER|BIGINT|FLOAT|DOUBLE|VARCHAR|DATE"
    r"|TIMESTAMP( WITH TIME ZONE)?|DECIMAL\(([1-9]|1[0-8]),\s*\d+\))$")


def oracle_type_violations(con, sql):
    """Column names whose DuckDB result type is outside the contract."""
    rel = con.sql(sql)
    return [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
            if not ALLOWED_ORACLE_TYPE.match(str(t))]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def run_with_timeout(con, seconds, fn):
    """Run fn(); interrupt the DuckDB connection after `seconds`."""
    if not seconds:
        return fn()
    import threading
    timer = threading.Timer(seconds, con.interrupt)
    timer.start()
    try:
        return fn()
    finally:
        timer.cancel()


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/graft_verify"
    oracle_timeout = 0.0
    for i, a in enumerate(sys.argv):
        if a == "--oracle-timeout":
            oracle_timeout = float(sys.argv[i + 1])
        elif a.startswith("--oracle-timeout="):
            oracle_timeout = float(a.split("=", 1)[1])
    if "--skip-spark" not in sys.argv:
        # clean the out dir: a stale result parquet from a previous run
        # would mask a query that now throws inside Verify
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
            cwd="/root/repo", capture_output=True, text=True)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-30:])
        if r.returncode != 0:
            print(tail)
            sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = n_timeout = 0
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        res_glob = f"{out_dir}/{name}/*.parquet"
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{res_glob}')")
            got_cols = sorted(got.columns)
            got_rows = sorted(
                tuple(norm(v) for v in row)
                for row in con.sql(
                    f"SELECT {','.join(got_cols)} FROM read_parquet('{res_glob}')").fetchall())
        except Exception as e:
            print(f"FAIL {name}: cannot read result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            status = "ROWS-ONLY" if got_rows else "FAIL (0 rows)"
            print(f"{status:9s} {name}: {len(got_rows)} rows")
            n_fail += 0 if got_rows else 1
            continue
        try:
            bad_types = oracle_type_violations(con, oracle[name])
            if bad_types:
                print(f"FAIL {name}: oracle result type outside contract "
                      f"(driver's typed hash diverges on these): {bad_types}")
                n_fail += 1
                continue
            exp = con.sql(oracle[name])
            exp_cols = sorted(exp.columns)
            exp_rows = run_with_timeout(con, oracle_timeout, lambda: sorted(
                tuple(norm(v) for v in row)
                for row in con.sql(
                    f"SELECT {','.join(exp_cols)} FROM ({oracle[name]})").fetchall()))
        except duckdb.InterruptException:
            print(f"TIMEOUT   {name}: oracle exceeded {oracle_timeout:g}s "
                  f"(quadratic ground truth at replay scale?) — not counted as fail")
            n_timeout += 1
            continue
        except Exception as e:
            if "INTERRUPT" in str(e).upper():
                print(f"TIMEOUT   {name}: oracle exceeded {oracle_timeout:g}s "
                      f"(quadratic ground truth at replay scale?) — not counted as fail")
                n_timeout += 1
                continue
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif got_rows != exp_rows:
            diffs = [(g, e) for g, e in zip(got_rows, exp_rows) if g != e][:3]
            print(f"FAIL {name}: {len(got_rows)} vs {len(exp_rows)} rows; first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS      {name}: {len(got_rows)} rows")
            n_pass += 1
    # a query that threw inside Verify has no result dir at all —
    # surface it instead of silently shrinking the checked set
    have = {p.name for p in Path(out_dir).iterdir() if p.is_dir()}
    for name in sorted(set(oracle) - have):
        print(f"FAIL {name}: no result written (query threw in Verify?)")
        n_fail += 1
    timeouts = f", {n_timeout} timeout" if n_timeout else ""
    print(f"== {n_pass} pass, {n_fail} fail{timeouts} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
