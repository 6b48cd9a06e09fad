#!/usr/bin/env python
"""Empirical recall of the banded hyperplane LSH vs exact ground
truth, measured ACROSS the adaptive bits+bands regimes — for BOTH
pinned band tables.

calibration family (default, threshold 0.45): the joint bits+bands
knob's claim (SCALING.md, round 7) is that bands grow to HOLD recall
as bits uncap past 12. The math is property-tested
(tests/test_round7_props.py pins the band table as the minimal
recall-holding schedule under the hyperplane collision model), and the
fixture-scale recall (>=93% at the hard 0.45 threshold, 6-bit regime)
is pinned in tests/test_pipeline_ops.py against the exact O(n^2) form.
What neither shows is MEASURED recall in the extension regimes the
knob actually added -- 10 bits at 20k vectors, 13 bits / 50 bands at
200k. Measured round 7: SCALE_r07_recall.json.

strict family (--family strict, threshold 0.90): the production
near-dup path (dedup_embedding_near_strict). The synthetic fixture
space tops out near cos 0.6, so a 0.90 ground truth over the raw
fixture is VACUOUS (zero true pairs) — this mode therefore PLANTS
near-dup pairs first: for a sample of base vectors it appends one
perturbed copy at an exact target cosine drawn uniformly from
[PLANT_LO, PLANT_HI] (straddling the threshold, so the just-under
band exercises the boundary), then measures recall of the production
candidate generator (strict band table + the min_cs=0.30 audit-floor
pushdown, the same arguments q_dedup_embedding_near_strict passes)
against the EXACT truth recomputed from the stored float32 vectors —
planting targets are set in float64, so the truth never trusts them.

Both modes:
  * ground truth: blocked float64 BLAS all-pairs cosine in numpy,
    pairs with round(cos, 4) >= threshold (the registered queries'
    exact verification rule) -- O(n^2) work that the engine itself
    must never do, which is precisely why it lives in an offline audit;
  * candidates: the production pair generator
    (``embedding_scored_pairs``), anti-joined against the truth in
    Spark;
  * recall = 1 - missed/true, per fixture, vs the random-hyperplane
    collision model's expectation over the SAME truth population.

Zero-norm vectors are dropped from the truth side (cosine undefined;
the engine scores them NULL, which never passes the threshold).

Usage:
    python scripts/lsh_recall_audit.py --dirs DIR... --out OUT.json
    python scripts/lsh_recall_audit.py --family strict --dirs DIR... \
        --out SCALE_r08_recall_strict.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow.parquet as pq

DEFAULT_DIRS = [
    "/root/testdata/sf0.1",
    "/tmp/spark_graft_scale/sf1.0",
    "/tmp/spark_graft_scale/sf10emb",
]
CHUNK = 2048
# strict-mode planting: one perturbed copy per sampled base vector at
# an exact float64 target cosine uniform in [PLANT_LO, PLANT_HI] —
# most above the 0.90 threshold (the recall population), the rest a
# hard-negative band just under it. Copies never share a base, so the
# only >=0.90 pairs an augmented corpus can contain are (base, copy)
# pairs and natural fixture pairs (none: fixture tops near 0.6).
PLANT_LO, PLANT_HI = 0.85, 0.995
PLANT_FRACTION = 0.05  # copies per corpus vector
PLANT_SEED = 8


def plant_near_dups(src_dir: str, out_path: str) -> int:
    """Write an augmented embeddings.parquet: the fixture plus
    PLANT_FRACTION perturbed copies (new vec_ids past the max). The
    copy of unit base u is norm(base) * (c*u + sqrt(1-c^2)*r_perp)
    stored as float32 — exact target cosine c in float64, so the
    stored cosine lands within float32 rounding of c and the audit's
    truth pass recomputes it exactly as the engine will see it."""
    import pyarrow as pa

    t = pq.read_table(src_dir + "/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pandas(), dtype=np.int64)
    X = np.stack(t.column("embedding").to_pandas().values).astype(np.float64)
    norms = np.linalg.norm(X, axis=1)
    eligible = np.nonzero(norms > 0)[0]
    rng = np.random.default_rng(PLANT_SEED)
    k = max(100, int(len(ids) * PLANT_FRACTION))
    pick = rng.choice(eligible, size=min(k, len(eligible)), replace=False)
    targets = rng.uniform(PLANT_LO, PLANT_HI, size=len(pick))
    U = X[pick] / norms[pick, None]
    R = rng.standard_normal(U.shape)
    R -= (R * U).sum(axis=1, keepdims=True) * U
    R /= np.linalg.norm(R, axis=1, keepdims=True)
    W = targets[:, None] * U + np.sqrt(1.0 - targets**2)[:, None] * R
    copies = (W * norms[pick, None]).astype(np.float32)
    new_ids = ids.max() + 1 + np.arange(len(pick), dtype=np.int64)
    all_ids = np.concatenate([ids, new_ids])
    all_vecs = list(np.stack(t.column("embedding").to_pandas().values)) + list(
        copies
    )
    out = pa.table(
        {
            "vec_id": pa.array(all_ids, type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in all_vecs], type=pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(out, out_path)
    return len(pick)


def true_pairs(path: str, threshold: float):
    """(lo_ids, hi_ids, cosines) of exact pairs with
    round4(cos) >= threshold, plus (n_kept, n_zero_dropped)."""
    t = pq.read_table(path)
    ids = np.asarray(t.column("vec_id").to_pandas(), dtype=np.int64)
    X = np.stack(t.column("embedding").to_pandas().values).astype(np.float64)
    assert len(np.unique(ids)) == len(ids), "audit expects unique vec_ids"
    norms = np.linalg.norm(X, axis=1)
    keep = norms > 0
    n_zero = int((~keep).sum())
    ids, X, norms = ids[keep], X[keep], norms[keep]
    Xn = X / norms[:, None]
    n = len(ids)
    out_a, out_b = [], []
    for lo in range(0, n, CHUNK):
        hi = min(lo + CHUNK, n)
        g = Xn[lo:hi] @ Xn.T                       # (chunk, n) f64 BLAS
        g = np.round(g, 4)
        ii, jj = np.nonzero(g >= threshold)
        gi = ii + lo
        upper = jj > gi                            # strict upper triangle
        out_a.append(gi[upper])
        out_b.append(jj[upper])
    a_idx = np.concatenate(out_a)
    b_idx = np.concatenate(out_b)
    va, vb = ids[a_idx], ids[b_idx]
    # exact cosines of the true pairs, for the model expectation
    cs = np.einsum("ij,ij->i", Xn[a_idx], Xn[b_idx])
    # the engine's pair orientation is (smaller vec_id, larger vec_id)
    lo_id = np.minimum(va, vb)
    hi_id = np.maximum(va, vb)
    return lo_id, hi_id, cs, n, n_zero


def model_recall(cos: np.ndarray, bits: int, bands: int) -> float:
    """Expected recall over the true-pair population under the ideal
    random-hyperplane collision model: per-plane agreement
    p(c) = 1 - acos(c)/pi, band collision p^bits, any-of-L bands."""
    p = 1.0 - np.arccos(np.clip(cos, -1.0, 1.0)) / np.pi
    return float(np.mean(1.0 - (1.0 - p**bits) ** bands))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="+", default=DEFAULT_DIRS)
    ap.add_argument("--out", default="SCALE_recall.json")
    ap.add_argument(
        "--family", choices=["calibration", "strict"], default="calibration"
    )
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from os___mapreduceframework_spark.operators.dedup import (
        EMB_STRICT_REPORT_FLOOR,
    )
    from os___mapreduceframework_spark.operators.minhash import (
        EMB_STRICT_THRESHOLD,
        canonical_embeddings,
        emb_adaptive_bands,
        emb_adaptive_bits,
        emb_strict_bands,
        embedding_scored_pairs,
    )
    from os___mapreduceframework_spark.session import get_session

    strict = args.family == "strict"
    threshold = EMB_STRICT_THRESHOLD if strict else 0.45
    bands_for = emb_strict_bands if strict else emb_adaptive_bands

    spark = get_session(app_name=f"lsh_recall_audit_{args.family}")
    report = {"threshold": threshold, "family": args.family, "dirs": {}}
    if strict:
        report["planting"] = {
            "fraction": PLANT_FRACTION,
            "cosine_range": [PLANT_LO, PLANT_HI],
            "seed": PLANT_SEED,
            "note": "fixture space tops near cos 0.6 — a 0.90 truth "
            "needs planted pairs; targets straddle the threshold so "
            "the just-under band exercises the boundary",
        }
    for d in args.dirs:
        with tempfile.TemporaryDirectory(prefix="recall_") as tmp:
            if strict:
                emb_path = os.path.join(tmp, "embeddings.parquet")
                n_planted = plant_near_dups(d, emb_path)
            else:
                emb_path = os.path.join(d, "embeddings.parquet")
                n_planted = 0
            t0 = time.perf_counter()
            lo_id, hi_id, cs, n, n_zero = true_pairs(emb_path, threshold)
            truth_sec = round(time.perf_counter() - t0, 1)

            import pandas as pd

            path = os.path.join(tmp, "truth.parquet")
            pd.DataFrame({"id_a": lo_id, "id_b": hi_id}).to_parquet(path)
            truth = spark.read.parquet(path)

            emb = canonical_embeddings(
                spark.read.parquet(emb_path)
                .select(
                    "vec_id", F.col("embedding").cast("array<double>").alias("e")
                )
            ).localCheckpoint(eager=False)
            t1 = time.perf_counter()
            n_total = n + n_zero
            cand = embedding_scored_pairs(
                emb,
                n_vectors=n_total,
                nbands=bands_for(n_total),
                # the strict query's audit-floor pushdown rides along:
                # the audited path is the production path, arguments
                # verbatim from q_dedup_embedding_near_strict
                min_cs=EMB_STRICT_REPORT_FLOOR if strict else None,
            ).select("id_a", "id_b")
            missed = truth.join(cand, ["id_a", "id_b"], "left_anti").count()
            cand_sec = round(time.perf_counter() - t1, 1)

        n_true = int(len(lo_id))
        bits = emb_adaptive_bits(n_total)
        bands = bands_for(n_total)
        entry = {
            "n": n,
            "n_planted": n_planted,
            "n_zero_norm_dropped": n_zero,
            "nbits": bits,
            "nbands": bands,
            "true_pairs": n_true,
            "missed": int(missed),
            "recall": round(1.0 - missed / n_true, 4) if n_true else None,
            # what the ideal random-hyperplane model predicts for THIS
            # truth population (integrates the cosine distribution, not
            # just the at-threshold floor) -- measured vs model is the
            # audit's verdict: a measured >= model says the banding
            # implementation delivers its designed recall
            "model_expected_recall": (
                round(model_recall(cs, bits, bands), 4) if n_true else None
            ),
            "model_floor_at_threshold": (
                round(model_recall(np.array([threshold]), bits, bands), 4)
            ),
            "truth_sec": truth_sec,
            "cand_anti_join_sec": cand_sec,
        }
        report["dirs"][d] = entry
        print(f"# {d}: {json.dumps(entry)}", file=sys.stderr, flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(json.dumps({"out": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
