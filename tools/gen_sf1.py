#!/usr/bin/env python3
"""Generate an sf1 scaling fixture (10x sf0.1) for the SCALE.md
checkpoint. Fact tables replicate 10x with key offsets; documents and
embeddings are PERTURBED per replica so the duplicate/near-dup RATE
stays constant as the corpus grows (verbatim replication would put
every doc in a 10-copy near-dup cluster and the pair queries would
measure the fixture's quadratic blowup, not the engine). Dims copy
as-is (facts grow faster than dims, the realistic shape).

Driver-side tooling only (duckdb/pyarrow are not available to the
library itself). Output: scale-data/sf1/*.parquet (gitignored).
"""
import duckdb
import numpy as np
import os
import pyarrow as pa
import pyarrow.parquet as pq

SRC = '/root/testdata/sf0.1'
DST = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'scale-data', 'sf1')
REPLICAS = 10
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

# dims: copy verbatim
for t in ['region', 'nation', 'customer', 'supplier', 'part']:
    con.execute(f"""COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))
                    TO '{DST}/{t}.parquet' (FORMAT parquet)""")
    print(t, 'copied')

# facts with pure key offsets (orders/lineitem share the orderkey space;
# customers/parts/suppliers stay the same -> 10x orders per customer)
# offset must clear BOTH key spaces: childless orders can hold the
# max o_orderkey, and an offset from lineitem alone would collide
# replica key ranges
maxo = con.execute(
    f"SELECT greatest((SELECT max(l_orderkey) FROM "
    f"read_parquet('{SRC}/lineitem.parquet')), (SELECT max(o_orderkey) "
    f"FROM read_parquet('{SRC}/orders.parquet')))").fetchone()[0] + 1
con.execute(f"""COPY (
  SELECT o_orderkey + i.range * {maxo} AS o_orderkey, o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{SRC}/orders.parquet'), range({REPLICAS}) i
) TO '{DST}/orders.parquet' (FORMAT parquet)""")
con.execute(f"""COPY (
  SELECT l_orderkey + i.range * {maxo} AS l_orderkey, l_partkey,
         l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{SRC}/lineitem.parquet'), range({REPLICAS}) i
) TO '{DST}/lineitem.parquet' (FORMAT parquet)""")
print('orders/lineitem replicated')

# events must keep parquet TIMESTAMP(NANOS) — Tables.load reads ts
# through the nanos-as-long legacy path and a us rewrite would break
# it — so replicate via pyarrow (duckdb writes us) with version 2.6
import pandas as pd
ev = pq.read_table(f'{SRC}/events.parquet').to_pandas()
maxe = int(ev.event_id.max()) + 1
maxu = int(ev.user_id.max()) + 1
reps = []
for i in range(REPLICAS):
    e = ev.copy()
    e['event_id'] = e.event_id + i * maxe
    e['user_id'] = e.user_id + i * maxu
    reps.append(e)
big = pd.concat(reps, ignore_index=True)
pq.write_table(pa.Table.from_pandas(big, preserve_index=False),
               f'{DST}/events.parquet', version='2.6',
               coerce_timestamps=None)
print('events replicated', len(big))

# documents: replica i replaces every 5th token (phase i%5) with a
# replica-unique token -> within-replica dup structure is preserved
# exactly (identical texts perturb identically), cross-replica shingle
# overlap drops below near-dup thresholds, so dup clusters stay their
# original size and only their COUNT grows 10x (linear, like a real
# bigger crawl).
docs = pq.read_table(f'{SRC}/documents.parquet').to_pandas()
maxd = int(docs.doc_id.max()) + 1
out = []
for i in range(REPLICAS):
    d = docs.copy()
    d['doc_id'] = d.doc_id + i * maxd
    if i > 0:
        def perturb(text, i=i):
            toks = text.split()
            return ' '.join(
                f'r{i}q{k}' if k % 5 == i % 5 else tok
                for k, tok in enumerate(toks))
        d['text'] = d.text.map(perturb)
        d['n_chars'] = d.text.str.len().astype(docs.n_chars.dtype)
    out.append(d)
big = pd.concat(out, ignore_index=True)
pq.write_table(pa.Table.from_pandas(big, preserve_index=False),
               f'{DST}/documents.parquet')
print('documents perturb-replicated', len(big))

# embeddings: deterministic per-replica noise at ~50% relative norm
# pushes cross-replica cosine to ~0.89, below near-dup thresholds;
# within-replica geometry (and its intentional near-dup pairs) is
# rigidly preserved per copy.
emb = pq.read_table(f'{SRC}/embeddings.parquet').to_pandas()
maxv = int(emb.vec_id.max()) + 1
vecs = np.stack(emb.embedding.to_numpy())
out = []
for i in range(REPLICAS):
    e = emb.copy()
    e['vec_id'] = e.vec_id + i * maxv
    if i > 0:
        rng = np.random.RandomState(1234 + i)
        noise = rng.normal(size=vecs.shape).astype(vecs.dtype)
        noise *= (np.linalg.norm(vecs, axis=1, keepdims=True) * 0.5 /
                  np.linalg.norm(noise, axis=1, keepdims=True))
        e['embedding'] = list(vecs + noise)
    out.append(e)
big = pd.concat(out, ignore_index=True)
pq.write_table(pa.Table.from_pandas(big, preserve_index=False),
               f'{DST}/embeddings.parquet')
print('embeddings perturb-replicated', len(big))
print('done ->', DST)
