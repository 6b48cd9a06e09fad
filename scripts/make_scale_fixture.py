#!/usr/bin/env python
"""Build a scaled-up copy of a testdata fixture for scaling-curve
measurement (VERDICT r5 item 1: "generate a ~sf1 fixture locally and
bench the heavy families at 10x").

Strategy: REPLICATION WITH DISJOINT KEY SPACES, not naive row copying.
Each fact table is replicated ``factor`` times; replica ``r`` offsets
every key column by ``r * (max_key + 1)`` so

  * referential integrity holds within each replica (orders->customer,
    lineitem->orders/part/supplier, embeddings/doc joins),
  * per-key cardinalities (rows per order, events per user) are
    UNCHANGED -- the scaled fixture stresses data volume, not key skew
    the original didn't have.

``region``/``nation`` stay fixed-size dims, exactly as TPC-H scaling
does: group-by-nation results keep 25 groups with ~factor x counts.

Two columns need more than key offsets, or replication would MANUFACTURE
cross-replica structure that breaks scaling measurements:

  * ``documents.text``: replica r>0 suffixes every whitespace-delimited
    token with ``q{r}`` (whitespace layout preserved). In-replica
    duplicate/shingle/boilerplate structure is preserved EXACTLY, while
    cross-replica shingles never collide -- so MinHash/exact-dup pair
    counts scale linearly (naive copying would make every doc a 10-way
    cross-replica duplicate: pair counts ~factor^2/2, a fake quadratic).
    ``n_chars`` is recomputed from the perturbed text.
  * ``embeddings.embedding``: replica r>0 applies a seeded per-dimension
    sign-flip pattern. Flipping BOTH vectors of a pair preserves their
    cosine, so each replica is an isometry of the original (identical
    in-replica top-k/cluster geometry) while cross-replica similarities
    decorrelate -- kNN candidate volume scales ~linearly instead of
    every vector gaining factor-1 exact twins in its LSH bucket.

Deterministic: same (src, factor) -> byte-identical output. Pure
pandas/pyarrow (sf0.1 is 17 MB; factor 10 output ~200 MB), no Spark.

Usage:
    python scripts/make_scale_fixture.py --factor 10 \
        --src /root/testdata/sf0.1 --dest /tmp/spark_graft_scale/sf1.0
"""

from __future__ import annotations

import argparse
import hashlib
import os
import re
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# key columns to offset, per table: {column: key-space owner table}
# (the owner determines the offset stride so FKs stay consistent)
KEYS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
DIMS = ["region", "nation"]  # fixed-size, copied verbatim
FACTS = list(KEYS)

_TOKEN = re.compile(r"\S+")


def _strides(src: str) -> dict[tuple[str, str], int]:
    out = {}
    for table, cols in KEYS.items():
        df = pd.read_parquet(os.path.join(src, f"{table}.parquet"))
        for col, owner in cols.items():
            if owner not in out:
                odf = (
                    df
                    if owner[0] == table
                    else pd.read_parquet(os.path.join(src, f"{owner[0]}.parquet"))
                )
                out[owner] = int(odf[owner[1]].max()) + 1
    return out


def _sign_flips(replica: int, dim: int) -> np.ndarray:
    """Seeded +-1 pattern for one replica; replica 0 is identity."""
    if replica == 0:
        return np.ones(dim, dtype=np.float32)
    seed = int.from_bytes(
        hashlib.sha256(f"scale-fixture-flip-{replica}".encode()).digest()[:4], "big"
    )
    rng = np.random.default_rng(seed)
    return np.where(rng.random(dim) < 0.5, -1.0, 1.0).astype(np.float32)


def _perturb_text(text: str, replica: int) -> str:
    if replica == 0 or not isinstance(text, str):
        return text
    suf = f"q{replica}"
    return _TOKEN.sub(lambda m: m.group(0) + suf, text)


def scale_table(src: str, table: str, factor: int, strides) -> pa.Table:
    df = pd.read_parquet(os.path.join(src, f"{table}.parquet"))
    parts = []
    for r in range(factor):
        rep = df.copy()
        for col, owner in KEYS[table].items():
            rep[col] = rep[col] + r * strides[owner]
        if table == "documents" and r > 0:
            rep["text"] = [_perturb_text(t, r) for t in rep["text"]]
            rep["n_chars"] = [
                len(t) if isinstance(t, str) else 0 for t in rep["text"]
            ]
        if table == "embeddings" and r > 0:
            dim = len(df["embedding"].iloc[0])
            flips = _sign_flips(r, dim)
            rep["embedding"] = [
                None if v is None else (np.asarray(v, dtype=np.float32) * flips)
                for v in rep["embedding"]
            ]
        parts.append(rep)
    out = pd.concat(parts, ignore_index=True)
    # pin the arrow schema to the source file's (list<float>, int32 dims,
    # timestamps) so Spark/DuckDB see identical types at every sf
    schema = pq.read_schema(os.path.join(src, f"{table}.parquet"))
    return pa.Table.from_pandas(out, schema=schema, preserve_index=False)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", required=True)
    ap.add_argument("--factor", type=int, required=True)
    args = ap.parse_args()

    os.makedirs(args.dest, exist_ok=True)
    strides = _strides(args.src)
    for table in DIMS:
        t = pq.read_table(os.path.join(args.src, f"{table}.parquet"))
        pq.write_table(t, os.path.join(args.dest, f"{table}.parquet"))
        print(f"{table}: {t.num_rows} rows (dim, copied)", flush=True)
    for table in FACTS:
        t = scale_table(args.src, table, args.factor, strides)
        # row groups sized so Spark still gets parallel splits
        pq.write_table(
            t, os.path.join(args.dest, f"{table}.parquet"), row_group_size=131072
        )
        print(f"{table}: {t.num_rows} rows ({args.factor}x)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
