#!/usr/bin/env python3
"""Derive an sf1 (10x sf0.1) dataset for the scale-headroom bench.

Dev tool only (the library itself is pure Scala/Spark): builds
tmp/sf1/*.parquet from /root/testdata/sf0.1 with 10 replicas r=0..9.
Replication is designed so per-operator WORK scales ~linearly, i.e.
replicas must not be near-duplicates of each other:

- lineitem/orders: order keys shifted by r * (max_orderkey+1); dims
  (customer/supplier/part/nation/region) stay fixed -> 10x facts per
  dim key, the usual fact-grows-faster-than-dim shape.
- events: event_id shifted; ts shifted by r * 97 hours (replicas land
  in disjoint windows; per-user event count grows 10x). TIMESTAMP
  NANOS is preserved via pyarrow (the Spark reader relies on it).
- documents: doc_id shifted; for r>0 the words are deterministically
  shuffled (seed=r) -> token multiset (and all token-level stats)
  preserved, shingle sets destroyed, so cross-replica docs are NOT
  near-dups and d2/d4/d7 candidate work scales with corpus size.
- embeddings: vec_id shifted; vector elements rotated by r -> within-
  replica cosines preserved (qualifying pairs x10), cross-replica
  cosines ~random (no quadratic pair blowup).
"""
import random
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmp/sf1")
R = 10
DST.mkdir(parents=True, exist_ok=True)

con = duckdb.connect()

def copy_sql(sql, name):
    con.execute(f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
    print(name, con.execute(f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0])

# dims unchanged
for t in ["region", "nation", "customer", "supplier", "part"]:
    copy_sql(f"SELECT * FROM '{SRC}/{t}.parquet'", t)

ko = con.execute(f"SELECT max(o_orderkey)+1 FROM '{SRC}/orders.parquet'").fetchone()[0]
copy_sql(
    f"""SELECT o_orderkey + r.r * {ko} AS o_orderkey, o_custkey, o_orderstatus,
        o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', (SELECT unnest(generate_series(0, {R-1})) AS r) r""",
    "orders")
copy_sql(
    f"""SELECT l_orderkey + r.r * {ko} AS l_orderkey, l_partkey, l_suppkey, l_linenumber,
        l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', (SELECT unnest(generate_series(0, {R-1})) AS r) r""",
    "lineitem")

# events: pyarrow to preserve the source's physical timestamp unit
# (TIMESTAMP(NANOS) in older drops, timestamp[us] since the 2026-08
# regeneration) — the shift is computed in that unit
ev = pq.read_table(SRC / "events.parquet")
eid_off = max(ev.column("event_id").to_pylist()) + 1
ts_unit = ev.schema.field("ts").type.unit
per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts_unit]
chunks = []
for r in range(R):
    t = ev
    t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                     pa.array([v + r * eid_off for v in ev.column("event_id").to_pylist()],
                              type=pa.int64()))
    ts = ev.column("ts").cast(pa.int64())
    shifted = pa.array([v + r * 97 * 3600 * per_sec for v in ts.to_pylist()], type=pa.int64())
    t = t.set_column(t.schema.get_field_index("ts"), "ts",
                     shifted.cast(pa.timestamp(ts_unit)))
    chunks.append(t)
big = pa.concat_tables(chunks)
pq.write_table(big, DST / "events.parquet", version="2.6", coerce_timestamps=None)
print("events", big.num_rows, big.schema.field("ts").type)

# documents: seeded word shuffle for r>0
docs = con.execute(f"SELECT doc_id, text, lang, source, n_chars FROM '{SRC}/documents.parquet' ORDER BY doc_id").fetchall()
did_off = max(d[0] for d in docs) + 1
rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
for r in range(R):
    rng = random.Random(1000 + r)
    for (doc_id, text, lang, source, n_chars) in docs:
        if r == 0:
            t2 = text
        else:
            words = text.split(" ")
            rng.shuffle(words)
            t2 = " ".join(words)
        rows["doc_id"].append(doc_id + r * did_off)
        rows["text"].append(t2)
        rows["lang"].append(lang)
        rows["source"].append(source)
        rows["n_chars"].append(len(t2))
pq.write_table(pa.table(rows, schema=pa.schema([
    ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
    ("source", pa.string()), ("n_chars", pa.int64())])), DST / "documents.parquet")
print("documents", len(rows["doc_id"]))

# embeddings: rotate elements by r
emb = con.execute(f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' ORDER BY vec_id").fetchall()
vid_off = max(e[0] for e in emb) + 1
rows = {"vec_id": [], "embedding": [], "label": []}
for r in range(R):
    for (vec_id, v, label) in emb:
        rows["vec_id"].append(vec_id + r * vid_off)
        rows["embedding"].append(v[r:] + v[:r] if r else v)
        rows["label"].append(label)
pq.write_table(pa.table(rows, schema=pa.schema([
    ("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
    ("label", pa.int32())])), DST / "embeddings.parquet")
print("embeddings", len(rows["vec_id"]))
