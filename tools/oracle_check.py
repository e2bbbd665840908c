#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with views registered for every
table in <sfDir>, and compares: schema (column names), row count, and a hash
of all values (columns sorted by name, rows in result order and also
row-sorted, so we catch both strict and lenient driver behaviors).
"""
import sys, os, json, glob, hashlib
import duckdb


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def table_hash(cols, rows, sort_rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    proj = [tuple(canon(r[i]) for i in order) for r in rows]
    if sort_rows:
        proj = sorted(proj)
    h = hashlib.sha256()
    for r in proj:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    results = {}
    n_pass = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        s_cols, s_rows = spark_rel.columns, spark_rel.fetchall()
        if name not in oracle:
            results[name] = f"ROWS-ONLY rows={len(s_rows)}"
            n_pass += 1
            continue
        try:
            o_rel = con.sql(oracle[name])
            o_cols, o_rows = o_rel.columns, o_rel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR {e}"
            continue
        problems = []
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"schema spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        else:
            # Typed compare (the driver hashes typed values): a DuckDB
            # HUGEINT sum vs Spark BIGINT stringifies identically but
            # hash-mismatches driver-side — catch it here. Round-1 evidence:
            # the driver tolerates integer-width differences up to 64 bits
            # (Spark INT vs DuckDB BIGINT passed) but not 128-bit HUGEINT,
            # so fold the <=64-bit int family into one class.
            def t_class(t):
                t = str(t)
                return "INT" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT") else t
            s_t = [t_class(t) for _, t in sorted(zip(s_cols, spark_rel.types), key=lambda x: x[0])]
            o_t = [t_class(t) for _, t in sorted(zip(o_cols, o_rel.types), key=lambda x: x[0])]
            if s_t != o_t:
                problems.append(f"types spark={s_t} oracle={o_t}")
        if len(s_rows) != len(o_rows):
            problems.append(f"rows spark={len(s_rows)} oracle={len(o_rows)}")
        if not problems:
            strict = table_hash(s_cols, s_rows, False) == table_hash(o_cols, o_rows, False)
            loose = table_hash(s_cols, s_rows, True) == table_hash(o_cols, o_rows, True)
            if strict and loose:
                results[name] = "PASS"
                n_pass += 1
            else:
                results[name] = f"HASH-MISMATCH strict={strict} rowsorted={loose}"
                # show first differing row for debugging
                order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                for i, (a, b) in enumerate(zip(s_rows, o_rows)):
                    ta = tuple(canon(a[j]) for j in order)
                    ob = sorted(range(len(o_cols)), key=lambda j: o_cols[j])
                    tb = tuple(canon(b[j]) for j in ob)
                    if ta != tb:
                        results[name] += f" | first diff row {i}: spark={ta} oracle={tb}"
                        break
        else:
            results[name] = "FAIL " + "; ".join(problems)
    for k, v in results.items():
        print(f"{'OK ' if v.startswith(('PASS','ROWS-ONLY')) else 'BAD'} {k}: {v}")
    print(f"\n{n_pass}/{len(results)} pass")
    sys.exit(0 if n_pass == len(results) else 1)


if __name__ == "__main__":
    main()
