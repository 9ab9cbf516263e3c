#!/usr/bin/env python3
"""Dev tooling (NOT part of the library): build a ×N scaled copy of the
WAREHOUSE tables (customer/supplier/part/orders/lineitem/events) from an
existing fixture dir, with consistently shifted keys per replica — the
TPC-H scaling model (facts AND dimensions grow linearly; nation/region
stay fixed). documents/embeddings are copied unscaled: replicating them
verbatim would plant 10 exact copies of every doc/vector and turn the
near-dup/ANN pair counts superlinear, which measures the corpus shape,
not the operator.

Usage: python3 tools/make_sfx.py <srcDir> <dstDir> [N=10]
"""
import sys, os, shutil
import duckdb

def main(src, dst, n=10):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    def mx(table, col):
        return con.execute(
            f"SELECT max({col})+1 FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0]
    C, S, P, O, E = (mx('customer', 'c_custkey'), mx('supplier', 's_suppkey'),
                     mx('part', 'p_partkey'), mx('orders', 'o_orderkey'),
                     mx('events', 'event_id'))
    shifts = {
        'customer': [('c_custkey', C)],
        'supplier': [('s_suppkey', S)],
        'part':     [('p_partkey', P)],
        'orders':   [('o_orderkey', O), ('o_custkey', C)],
        'lineitem': [('l_orderkey', O), ('l_partkey', P), ('l_suppkey', S)],
        'events':   [('event_id', E), ('user_id', C)],
    }
    for t, cols in shifts.items():
        desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')").fetchall()
        schema = [r[0] for r in desc]
        types = {r[0]: r[1] for r in desc}
        sel = []
        for i in range(n):
            # events.ts is stored as parquet timestamp[ns]; the Spark
            # loader reads it nanos-as-long, so the scaled copy must keep
            # an int64 nanos column, not DuckDB's default µs TIMESTAMP.
            # (When rescaling an already-scaled copy, ts is int64 already
            # and passes through.)
            exprs = ", ".join(
                f"{c} + {dict(cols)[c]}*{i} AS {c}" if c in dict(cols)
                else (f"epoch_ns({c}) AS {c}"
                      if (t, c) == ('events', 'ts')
                      and 'TIMESTAMP' in types[c].upper() else c)
                for c in schema)
            sel.append(f"SELECT {exprs} FROM read_parquet('{src}/{t}.parquet')")
        q = " UNION ALL ".join(sel)
        con.execute(f"COPY ({q}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: x{n} -> {dst}/{t}.parquet")
    for t in ['region', 'nation', 'documents', 'embeddings']:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"{t}: copied unscaled")

if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
