#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, registers the sfDir parquet
tables as DuckDB views, runs the oracle SQL from oracle_sql.json, and
compares against the Spark parquet dump: row count, column names
(sorted), and a value hash (rows sorted, columns sorted by name,
floats rounded to 12 significant digits — enough to absorb last-ulp
noise while keeping cents up to ~1e9-magnitude money totals).
This mirrors what CORRECTNESS_r{N}.json checks so oracle-SQL typos
surface before the round boundary.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 SIGNIFICANT digits: round(v, 9) gave large-magnitude
        # doubles zero ulp absorption, but 9g was too coarse the
        # other way — at 1e9-magnitude exact-cents money totals it
        # dropped the cents, blinding the gate to real absolute
        # differences. 1e-12 relative still absorbs last-ulp
        # (1e-16) noise while keeping cents up to ~1e9 magnitude
        # (12 sig digits = 1e9 integer part + 2 decimals; 1e10
        # totals would need 13). -0.0 folds to 0.0 so sign-of-zero
        # never splits engines.
        return repr(float(f"{v + 0.0:.12g}") + 0.0)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    n_skip = 0
    for name, sql in sorted(oracle.items()):
        # subset Verify runs (3rd arg) dump only some queries; a
        # missing dump dir is "not run", not a failure
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        try:
            # Type lint BEFORE value compare: a bare HUGEINT output
            # column (DuckDB sum(BIGINT) → int128) hashes green here
            # (fetchall gives python int) but hash-mismatched in the
            # driver's round-5 gate (q64/q69, the catalog's only two
            # bare-HUGEINT oracles, were its only hash failures).
            # Fail loudly so new oracles add an outer CAST(... AS
            # BIGINT) like q70 instead of rediscovering this.
            rel_types = [str(t) for t in con.sql(sql).types]
            bad_types = [t for t in rel_types
                         if t in ("HUGEINT", "UHUGEINT")
                         or t.startswith("DECIMAL")]
            if bad_types:
                print(f"FAIL {name}: oracle emits non-plain column types "
                      f"{bad_types} (types={rel_types}); CAST sums to "
                      "BIGINT and decimal literals to DOUBLE")
                n_fail += 1
                continue
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
            sp = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [d[0] for d in sp.description]
            srows = sp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(dcols) != sorted(scols):
            print(f"FAIL {name}: cols duck={sorted(dcols)} spark={sorted(scols)}")
            ok = False
        elif len(drows) != len(srows):
            print(f"FAIL {name}: rows duck={len(drows)} spark={len(srows)}")
            ok = False
        else:
            dk, sk = table_key(drows, dcols), table_key(srows, scols)
            if dk != sk:
                diffs = [i for i, (a, b) in enumerate(zip(dk, sk)) if a != b]
                print(f"FAIL {name}: {len(diffs)} differing rows; first: "
                      f"duck={dk[diffs[0]]} spark={sk[diffs[0]]}")
                ok = False
        if ok:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    skipped = f", {n_skip} skipped (not dumped)" if n_skip else ""
    print(f"== {n_pass} pass, {n_fail} fail{skipped} ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
