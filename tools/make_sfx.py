#!/usr/bin/env python3
"""Self-scaled stress corpus generator (driver-side tooling, like check.py).

Usage: python3 tools/make_sfx.py SRC_SF_DIR DST_DIR FACTOR [DISTINCT_FACTOR]

Builds an N-times-larger corpus from a driver sf directory:
  - dimension tables (region nation customer supplier part) copy unchanged,
    so per-key fan-in grows by FACTOR — the skew direction of real growth;
  - orders/lineitem replicate FACTOR times with o_orderkey/l_orderkey
    offset per replica (join keys stay consistent, order count grows);
  - events replicate FACTOR times with event_id offset, user_id unchanged
    (per-user event streams deepen by FACTOR);
  - documents/embeddings replicate DISTINCT_FACTOR distinct VARIANTS x
    (FACTOR / DISTINCT_FACTOR) exact COPIES each. A variant mutates the
    first token (text) / the first vector component (embeddings), so
    variants of one base doc are mutual NEAR-duplicates while copies are
    EXACT duplicates — the worst realistic shape for the dedup paths: the
    exact-dedup stage must collapse the copies and the near-dup stage must
    still face a DISTINCT corpus DISTINCT_FACTOR times larger.
    DISTINCT_FACTOR defaults to 1 (pure-copy replication, the round-6
    10x shape); it must divide FACTOR.

Ids are offset by replica * 10^12 so every replica's id space is disjoint
and original ids remain recoverable (id % 10^12).
"""
import os
import sys

import duckdb

OFF = 10 ** 12


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    dfactor = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    assert factor % dfactor == 0, "DISTINCT_FACTOR must divide FACTOR"
    copies = factor // dfactor
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def write(name, sql):
        con.execute(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    for t in ["region", "nation", "customer", "supplier", "part"]:
        write(t, f"SELECT * FROM '{src}/{t}.parquet'")

    write("orders", f"""
        SELECT o_orderkey + r.i * {OFF} AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet', range({factor}) r(i)""")

    write("lineitem", f"""
        SELECT l_orderkey + r.i * {OFF} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet', range({factor}) r(i)""")

    write("events", f"""
        SELECT event_id + r.i * {OFF} AS event_id, ts, user_id, event_type,
               value, props
        FROM '{src}/events.parquet', range({factor}) r(i)""")

    # variant v > 0 rewrites the first token; copies within a variant are
    # byte-identical. Replica index = v * copies + c.
    write("documents", f"""
        SELECT doc_id + (v.i * {copies} + c.i) * {OFF} AS doc_id,
               CASE WHEN v.i = 0 THEN text
                    ELSE 'variant' || v.i || substr(text, strpos(text, ' '))
               END AS text,
               lang, source,
               CAST(length(CASE WHEN v.i = 0 THEN text
                    ELSE 'variant' || v.i || substr(text, strpos(text, ' '))
               END) AS BIGINT) AS n_chars
        FROM '{src}/documents.parquet', range({dfactor}) v(i), range({copies}) c(i)""")

    # variant v perturbs component 1 by v * 0.05 (well beyond the 1e-3
    # quantization step, so variants are distinct to every scorer); copies
    # are byte-identical
    write("embeddings", f"""
        SELECT vec_id + (v.i * {copies} + c.i) * {OFF} AS vec_id,
               CASE WHEN v.i = 0 THEN embedding
                    ELSE list_prepend(CAST(embedding[1] + v.i * 0.05 AS FLOAT),
                                      embedding[2:])
               END AS embedding,
               label
        FROM '{src}/embeddings.parquet', range({dfactor}) v(i), range({copies}) c(i)""")


if __name__ == "__main__":
    main()
