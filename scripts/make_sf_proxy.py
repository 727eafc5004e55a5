#!/usr/bin/env python
"""Generate a 10x scaled MEASUREMENT PROXY of an sf testdata dir.

The driver's round-end bench runs at a driver-generated sf1.0 that is
not on disk between rounds (BENCH_r05.json: "sf": 1.0). This script
builds /root/testdata_proxy/sf1.0 from /root/testdata/sf0.1 so that
optimization A/Bs can be ranked at the scale the driver actually times.
It is a PROXY: row counts and key-domain shapes match a 10x scale-up,
value distributions are replicas of sf0.1 with offset keys. It is never
read by bench.py (whose data dir comes from $SPARK_GRAFT_SF_DIR) or by
any declared query; timing-only.

Replication scheme, copy i in 0..9 (copy 0 == the original bytes):
  - every integer primary/foreign key is offset by i * (max_key + 1) of
    its table, consistently across fact/dimension tables, so join
    relationships and per-key densities survive;
  - nation/region (tiny dims) are NOT replicated — FK domains unchanged;
  - documents.text is salted per-copy (every whitespace token gets a
    "~i" suffix) so the near-duplicate structure WITHIN a copy matches
    the original corpus while copies are fully dissimilar — a plain 10x
    text copy would hand the dedup/simhash queries a quadratic planted
    pair explosion no real 10x corpus has;
  - events keep their time window (10x the traffic in the same window).
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata_proxy/sf1.0"
COPIES = int(os.environ.get("PROXY_COPIES", "10"))

# table -> columns to offset by i * (table_max + 1) of the named domain
OFFSETS = {
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
DOMAIN_OF = {  # domain -> (table, column) that defines its max
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "custkey": ("customer", "c_custkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}
UNCHANGED = ["nation", "region"]


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    strides = {}
    for dom, (tbl, col) in DOMAIN_OF.items():
        t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"), columns=[col])
        strides[dom] = int(pc.max(t[col]).as_py()) + 1
    print("strides:", strides)

    for tbl in UNCHANGED:
        t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"))
        pq.write_table(t, os.path.join(DST, f"{tbl}.parquet"))
        print(tbl, t.num_rows)

    salt_re = re.compile(r"\S+")
    for tbl, offs in OFFSETS.items():
        t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"))
        copies = []
        for i in range(COPIES):
            c = t
            for col, dom in offs.items():
                idx = c.schema.get_field_index(col)
                shifted = pc.add(c[col], pa.scalar(i * strides[dom], type=c.schema.field(col).type))
                c = c.set_column(idx, c.schema.field(col), shifted)
            if tbl == "documents" and i > 0:
                texts = c["text"].to_pylist()
                suf = f"~{i}"
                salted = [salt_re.sub(lambda m: m.group(0) + suf, x or "") for x in texts]
                arr = pa.array(salted, type=c.schema.field("text").type)
                c = c.set_column(c.schema.get_field_index("text"), c.schema.field("text"), arr)
                if "n_chars" in c.schema.names:
                    nc = pa.array(np.array([len(s) for s in salted], dtype="int64"))
                    c = c.set_column(
                        c.schema.get_field_index("n_chars"), c.schema.field("n_chars"), nc
                    )
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(DST, f"{tbl}.parquet"))
        print(tbl, t.num_rows, "->", out.num_rows)
    # bench derives its sf label from the dir name; mark completion
    with open(os.path.join(DST, "_DONE"), "w") as fh:
        fh.write("proxy of %s x%d\n" % (SRC, COPIES))


if __name__ == "__main__":
    main()
