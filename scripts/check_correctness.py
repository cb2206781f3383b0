#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each <sfDir>/*.parquet as a
DuckDB view named by basename, runs each oracle SQL, and compares against the
Spark result parquet at <verifyOutDir>/<name>/ — columns sorted by name,
values stringified, rows sorted, then hashed.
"""
import sys, os, glob, json, hashlib

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return hashlib.sha256("\n".join(out).encode()).hexdigest(), len(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
        )
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"MISSING  {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            o = con.execute(oracles[name])
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
            s = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')"
            )
            scols = [d[0] for d in s.description]
            srows = s.fetchall()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"SCHEMA   {name}: oracle={sorted(ocols)} spark={sorted(scols)}")
            n_fail += 1
            continue
        otypes = {d[0]: str(d[1]) for d in o.description}
        stypes = {d[0]: str(d[1]) for d in s.description}
        mismatched = {c: (otypes[c], stypes[c]) for c in otypes if otypes[c] != stypes[c]}
        if mismatched:
            print(f"TYPES?   {name}: {mismatched} (warning only)")
        # Second comparison through pandas — mirrors the driver's fetch
        # path, where e.g. a DuckDB HUGEINT sum() becomes float64/object
        # and stringifies differently from Spark's int64 even when
        # fetchall() values are identical Python ints.
        try:
            opd = con.execute(oracles[name]).df()
            spd = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')"
            ).df()
            oph, _ = canon(list(opd.itertuples(index=False, name=None)),
                           list(opd.columns))
            sph, _ = canon(list(spd.itertuples(index=False, name=None)),
                           list(spd.columns))
        except Exception as e:
            print(f"PDERROR  {name}: {e}")
            oph = sph = None
        oh, on = canon(orows, ocols)
        sh, sn = canon(srows, scols)
        if on != sn:
            print(f"ROWCOUNT {name}: oracle={on} spark={sn}")
            n_fail += 1
        elif oh == sh and oph != sph:
            print(f"PDHASH   {name}: {on} rows match via fetchall but "
                  f"differ via pandas (engine type portability, e.g. "
                  f"HUGEINT vs BIGINT) — dtypes oracle={dict(opd.dtypes.astype(str))} "
                  f"spark={dict(spd.dtypes.astype(str))}")
            n_fail += 1
        elif oh != sh:
            print(f"HASH     {name}: {on} rows, values differ")
            # show first diff
            ocan = sorted(["\x01".join(map(str, r)) for r in orows])
            scan = sorted(["\x01".join(map(str, r)) for r in srows])
            for a, b in zip(ocan, scan):
                if a != b:
                    print(f"  oracle: {a[:200]}")
                    print(f"  spark : {b[:200]}")
                    break
            n_fail += 1
        else:
            print(f"PASS     {name}: {on} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
