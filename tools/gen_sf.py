"""Scale-factor fixture generator: replicate the driver's sf0.1 tables
R x with key remapping, producing distribution-preserving larger SFs for
scaling measurements (SCALE.md sf0.1 -> sf1 ratios).

Design constraints (why each table is transformed the way it is):

- Keys offset by replica: ``key + i * (max_key + 1)`` keeps referential
  integrity within each replica (orders->customer, lineitem->orders/
  part/supplier) so join selectivities scale linearly, like a real 10x
  corpus.
- ``events.ts`` is ms-floored at generation: the driver fixture stores
  TIMESTAMP(NANOS), which this DuckDB writes back as TIMESTAMP(MICROS)
  — Spark would then read full us precision while the oracle views
  floor to ms (sources/catalog.py contract), so sub-ms digits would
  diverge the differential.  Flooring at generation keeps both engines
  bit-identical.  Time RANGE is intentionally unchanged: 10x data in
  the same window = densification, which is how event streams actually
  grow (windows get heavier, not longer).
- ``documents.text``: every token in replica i>0 is prefixed ``r<i>``
  (regexp, preserves token/shingle counts and all within-replica
  similarity structure) so the near-dup graph replicates the organic
  one 10x instead of degenerating into 10-clone cliques whose pair
  count would grow quadratically — exact copies would benchmark an
  adversarial corpus, not a scaled one.
- ``embeddings.embedding``: replica i is rotated by i positions —
  norm- and geometry-preserving within a replica, uncorrelated across
  replicas (rotated random vectors stay random), same rationale.

Usage: python tools/gen_sf.py [src_dir] [dst_dir] [replicas]
Defaults: /root/testdata/sf0.1 -> ./testdata_gen/sf1 x10.
"""

from __future__ import annotations

import argparse
import os

import duckdb

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def generate(src: str, dst: str, replicas: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # timestamps must round-trip as INSTANTS (parquet isAdjustedToUTC=1,
    # like the driver fixtures): DuckDB writes plain TIMESTAMP as NTZ,
    # which Spark reads as TIMESTAMP_NTZ and unix_millis() then rejects.
    # Casting through TIMESTAMPTZ under an explicitly-UTC session keeps
    # the stored micros bit-identical while setting the instant flag.
    con.execute("SET TimeZone='UTC'")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{src}/{t}.parquet')")

    def k(table: str, col: str) -> int:
        return con.execute(
            f"SELECT max({col}) + 1 FROM {table}").fetchone()[0]

    kc, ks, kp = k("customer", "c_custkey"), k("supplier", "s_suppkey"), \
        k("part", "p_partkey")
    ko, ke, ku = k("orders", "o_orderkey"), k("events", "event_id"), \
        k("events", "user_id")
    kd, kv = k("documents", "doc_id"), k("embeddings", "vec_id")
    rep = f"CROSS JOIN range({replicas}) _r(i)"

    queries = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""
            SELECT c_custkey + i * {kc} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM customer {rep} ORDER BY c_custkey""",
        "supplier": f"""
            SELECT s_suppkey + i * {ks} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM supplier {rep} ORDER BY s_suppkey""",
        "part": f"""
            SELECT p_partkey + i * {kp} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM part {rep} ORDER BY p_partkey""",
        "orders": f"""
            SELECT o_orderkey + i * {ko} AS o_orderkey,
                   o_custkey + i * {kc} AS o_custkey,
                   o_orderstatus, o_totalprice,
                   CAST(o_orderdate AS TIMESTAMPTZ) AS o_orderdate,
                   o_orderpriority
            FROM orders {rep} ORDER BY o_orderkey""",
        "lineitem": f"""
            SELECT l_orderkey + i * {ko} AS l_orderkey,
                   l_partkey + i * {kp} AS l_partkey,
                   l_suppkey + i * {ks} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus,
                   CAST(l_shipdate AS TIMESTAMPTZ) AS l_shipdate
            FROM lineitem {rep} ORDER BY l_orderkey, l_linenumber""",
        "events": f"""
            SELECT event_id + i * {ke} AS event_id,
                   CAST(make_timestamp(epoch_ms(ts) * 1000)
                        AS TIMESTAMPTZ) AS ts,
                   user_id + i * {ku} AS user_id,
                   event_type, value, props
            FROM events {rep} ORDER BY event_id""",
        "documents": f"""
            SELECT doc_id + i * {kd} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE regexp_replace(text, '(\\S+)',
                             'r' || CAST(i AS VARCHAR) || '\\1', 'g')
                   END AS text,
                   lang, source,
                   length(CASE WHEN i = 0 THEN text
                          ELSE regexp_replace(text, '(\\S+)',
                               'r' || CAST(i AS VARCHAR) || '\\1', 'g')
                          END) AS n_chars
            FROM documents {rep} ORDER BY doc_id""",
        "embeddings": f"""
            SELECT vec_id + i * {kv} AS vec_id,
                   CAST(CASE WHEN i = 0 THEN embedding
                        ELSE list_concat(embedding[i + 1:],
                                         embedding[1:i])
                   END AS FLOAT[]) AS embedding,
                   label
            FROM embeddings {rep} ORDER BY vec_id""",
    }
    for t, q in queries.items():
        con.execute(f"COPY ({q}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="Replicate a fixture directory R x with key remapping.")
    p.add_argument("src", nargs="?", default="/root/testdata/sf0.1",
                   help="source parquet dir (default driver sf0.1)")
    p.add_argument("dst", nargs="?",
                   default=os.path.join(_HERE, "testdata_gen", "sf1"),
                   help="destination dir")
    p.add_argument("replicas", nargs="?", type=int, default=10,
                   help="replication factor")
    args = p.parse_args(argv)
    # Guard against the positional-arg slip `gen_sf.py SRC 10` that once
    # created a stray ./10 output dir: a bare integer is never a real
    # destination, it is almost certainly a misplaced replica count.
    # basename check too (ADVICE r8): './10' or 'testdata_gen/10'
    # from a misplaced count with an explicit dst are the same slip.
    if (args.dst.strip(os.sep).isdigit()
            or os.path.basename(args.dst.rstrip(os.sep)).isdigit()):
        p.error(f"dst {args.dst!r} looks like a replica count — usage is "
                f"`gen_sf.py [src] [dst] [replicas]` (three positionals)")
    if not os.path.isdir(args.src):
        p.error(f"src {args.src!r} is not a directory")
    return args


if __name__ == "__main__":
    a = parse_args()
    generate(a.src, a.dst, a.replicas)
