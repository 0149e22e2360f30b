"""Build an sfN-scale measurement proxy by replicating sf0.1 K times.

NOT driver data and NOT used by any query/test — measurement only
(guide §1: measure at the scale the driver measures at). Replication
rules keep per-query cost structure linear in K:

- int64 entity keys get +k*10**9 per replica so FK relations hold and
  group/user/doc cardinality scales with the data (timestamps are kept,
  so per-time-window density grows with scale, as a real generator's
  would).
- documents.text gets a per-replica Caesar shift over ASCII letters:
  length, word structure, repetition and within-replica duplicate
  structure are preserved exactly, while cross-replica shingle overlap
  is destroyed -> near-dup pair count scales linearly, not
  quadratically.
- embeddings get deterministic per-replica noise (60% of norm) so
  cross-replica cosine similarity drops below near-dup thresholds while
  within-replica geometry is exact.

Usage: python tools/make_sf_proxy.py [K] [out_dir]   (default 10, /root/sf1_proxy)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
KEY_OFFSET = 10**9

INT64_KEYS = {
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "nation": [],
    "region": [],
}
DIMS = {"nation", "region"}


def _caesar_table(k: int) -> bytes:
    t = bytearray(range(256))
    for base in (ord("a"), ord("A")):
        for i in range(26):
            t[base + i] = base + (i + k) % 26
    return bytes(t)


def upscale(table: str, k_total: int, out_dir: str) -> None:
    t = pq.read_table(f"{SRC}/{table}.parquet")
    if table in DIMS:
        pq.write_table(t, f"{out_dir}/{table}.parquet")
        print(f"{table}: dim copied ({t.num_rows} rows)")
        return
    parts = []
    for k in range(k_total):
        rep = t
        for col in INT64_KEYS[table]:
            idx = rep.schema.get_field_index(col)
            rep = rep.set_column(
                idx, col, pc.add(rep.column(col), pa.scalar(k * KEY_OFFSET))
            )
        if table == "documents" and k > 0:
            trans = _caesar_table(k)
            texts = rep.column("text").to_pylist()
            shifted = [s.translate(str.maketrans(
                "".join(map(chr, range(256))), trans.decode("latin-1"))) if s else s
                for s in texts]
            idx = rep.schema.get_field_index("text")
            rep = rep.set_column(idx, "text", pa.array(shifted, pa.string()))
        if table == "embeddings" and k > 0:
            vecs = np.asarray(rep.column("embedding").to_pylist(), dtype=np.float32)
            rng = np.random.default_rng(42 + k)
            noise = rng.standard_normal(vecs.shape).astype(np.float32)
            noise *= (np.linalg.norm(vecs, axis=1, keepdims=True)
                      / np.maximum(np.linalg.norm(noise, axis=1, keepdims=True), 1e-9)) * 0.6
            vecs = vecs + noise
            idx = rep.schema.get_field_index("embedding")
            rep = rep.set_column(
                idx, "embedding", pa.array(list(vecs), pa.list_(pa.float32()))
            )
        parts.append(rep)
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{out_dir}/{table}.parquet")
    print(f"{table}: {t.num_rows} -> {out.num_rows} rows")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/sf1_proxy"
    os.makedirs(out_dir, exist_ok=True)
    for table in INT64_KEYS:
        upscale(table, k, out_dir)


if __name__ == "__main__":
    main()
