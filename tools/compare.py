#!/usr/bin/env python3
"""Dev-only local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir> [--dump n1,n2,...]

Loads each <name>/ parquet written by graft.Verify, runs the matching SQL
from oracle_sql.json in DuckDB against the fixture tables, sorts columns by
name and rows by all columns, and compares cell values exactly.

--dump (r11 verdict item 4): for the named entries, write BOTH engines'
sorted results as <out_dir>/<name>_spark.csv / <name>_duckdb.csv plus a
versions_oracle.txt — the committed diff surface for a driver-red/
mirror-green divergence (the r11 theil/hier_rollup split was undiagnosable
because nothing recorded what either oracle environment actually rendered).
"""
import duckdb, json, math, sys, glob, os

def values_eq(a, b):
    return a == b

out_dir, sf_dir = sys.argv[1], sys.argv[2]
dump = set()
if len(sys.argv) > 4 and sys.argv[3] == "--dump":
    dump = set(sys.argv[4].split(","))
    import pandas, numpy
    with open(f"{out_dir}/versions_oracle.txt", "w") as fh:
        fh.write(f"duckdb={duckdb.__version__}\npandas={pandas.__version__}\n"
                 f"numpy={numpy.__version__}\npython={sys.version.split()[0]}\n")
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out_dir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        sp = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        du = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    sp = sp.reindex(sorted(sp.columns), axis=1)
    du = du.reindex(sorted(du.columns), axis=1)
    if name in dump:
        # dumped BEFORE any gate so a failing entry still leaves its diff
        # surface; each side sorted by its own columns for stable diffs
        sp.sort_values(list(sp.columns), na_position="first") \
          .to_csv(f"{out_dir}/{name}_spark.csv", index=False)
        du.sort_values(list(du.columns), na_position="first") \
          .to_csv(f"{out_dir}/{name}_duckdb.csv", index=False)
        with open(f"{out_dir}/{name}_dtypes.txt", "w") as fh:
            fh.write("".join(f"{c}: spark={sp[c].dtype}\n" for c in sp.columns))
            fh.write("".join(f"{c}: duckdb={du[c].dtype}\n" for c in du.columns))
    if list(sp.columns) != list(du.columns):
        print(f"FAIL {name}: columns {list(sp.columns)} vs {list(du.columns)}")
        n_fail += 1; continue
    if len(sp) != len(du):
        print(f"FAIL {name}: rows {len(sp)} vs {len(du)}"); n_fail += 1; continue
    # The driver's hash is dtype/repr-sensitive: an oracle HUGEINT window
    # SUM lands as float64/object in pandas while Spark's BIGINT stays
    # int64 — values_eq(66, 66.0) would hide it, so fail on dtype drift.
    dt_bad = [c for c in sp.columns if str(sp[c].dtype) != str(du[c].dtype)]
    if dt_bad:
        print(f"FAIL {name}: dtype drift {[(c, str(sp[c].dtype), str(du[c].dtype)) for c in dt_bad]}")
        n_fail += 1; continue
    sp = sp.sort_values(list(sp.columns), na_position="first").reset_index(drop=True)
    du = du.sort_values(list(du.columns), na_position="first").reset_index(drop=True)
    bad = None
    for c in sp.columns:
        for i, (a, b) in enumerate(zip(sp[c], du[c])):
            anull = a is None or (isinstance(a, float) and math.isnan(a))
            bnull = b is None or (isinstance(b, float) and math.isnan(b))
            if anull and bnull:
                continue
            if anull != bnull or not values_eq(a, b):
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: col={c} row={i}: spark={a!r} duckdb={b!r}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(sp)} rows)")
        n_pass += 1

print(f"\n{n_pass} passed, {n_fail} failed")
sys.exit(1 if n_fail else 0)
