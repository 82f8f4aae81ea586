"""Generate the sf1 SCALE-RAMP dataset for the bench (r8 judge task #3).

At sf0.1 every bench query is dominated by ~0.5 s of fixed Spark overhead,
so plan regressions are invisible — the ramp makes the bench discriminate
again. This derives a DETERMINISTIC 10x dataset from the driver-provided
sf0.1 tables (never modifying /root/testdata): each scalable table is
replicated SCALE times with id/timestamp remapping so the data stays
semantically sensible rather than degenerate:

- documents: doc_id offset per copy; a short ``c<copy>`` marker appended to
  the text so copies are near-dups (shared shingles stress the LSH/minhash
  paths realistically) but not exact dups (exact dedup would otherwise
  collapse 90% of the corpus).
- embeddings: vec_id offset; deterministic hash-noise perturbation
  (~1% amplitude) so copies are near- but not exact-duplicates.
- events: event_id offset; ts shifted by copy * (span + 1 h) — each user's
  history grows 10x longer, so sessionization scales in rows, not in
  pathological same-instant pileups.
- lineitem / orders: key offset per copy; all other columns as-is (10x
  rows per date/flag group — the group count stays constant, row density
  grows, exactly what a scale-up does).
- dims (region nation customer supplier part): copied verbatim.

Output: /root/repo/benchdata/sf1/*.parquet (gitignored — regenerate with
this script; ~10x sf0.1 sizes). Pure DuckDB, no Spark session needed.

Usage: python tools/make_scale_data.py [scale] [out_dir]
"""

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchdata", "sf1",
)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def gen(table: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    copies = f"(SELECT unnest(range({SCALE})) AS copy)"

    gen("documents", f"""
        SELECT doc_id + copy * 10000000 AS doc_id,
               CASE WHEN copy = 0 THEN text
                    ELSE text || ' c' || copy::VARCHAR END AS text,
               lang, source,
               CASE WHEN copy = 0 THEN n_chars
                    ELSE n_chars + 2 + length(copy::VARCHAR) END AS n_chars
        FROM '{SRC}/documents.parquet', {copies}
    """)

    gen("embeddings", f"""
        SELECT vec_id + copy * 10000000 AS vec_id,
               CASE WHEN copy = 0 THEN embedding
                    ELSE list_transform(
                        embedding,
                        x -> (x + 0.01 * (((hash(vec_id * 131 + copy)
                                            % 1000)::BIGINT - 500) / 500.0))::FLOAT
                    ) END AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', {copies}
    """)

    span = con.sql(
        f"SELECT max(ts) - min(ts) FROM '{SRC}/events.parquet'"
    ).fetchone()[0]
    gen("events", f"""
        SELECT event_id + copy * 100000000 AS event_id,
               ts + copy * (INTERVAL '{span.total_seconds() + 3600} seconds')
                 AS ts,
               user_id, event_type, value, props
        FROM '{SRC}/events.parquet', {copies}
    """)

    gen("lineitem", f"""
        SELECT l_orderkey + copy * 100000000 AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', {copies}
    """)

    gen("orders", f"""
        SELECT o_orderkey + copy * 100000000 AS o_orderkey,
               o_custkey, o_orderstatus, o_totalprice, o_orderdate,
               o_orderpriority
        FROM '{SRC}/orders.parquet', {copies}
    """)

    for dim in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{dim}.parquet", f"{OUT}/{dim}.parquet")
        print(f"{dim}: copied")


if __name__ == "__main__":
    main()
