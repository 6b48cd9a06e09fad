#!/usr/bin/env python
"""Candidate-volume diagnostic for the embedding hyperplane LSH
(VERDICT r6 item 2: re-measure the 300x candidate curve after the
joint bits+bands knob).

For each fixture dir, bands the canonical corpus with the production
parameters (emb_adaptive_bits / emb_adaptive_bands) and reports:

  * n (distinct vec_ids), nbits, nbands;
  * candidates: the EXACT pair volume the verify join sees, computed
    from per-(band, bucket) sizes by the capped-pairs arithmetic
    (full sub-buckets * C(cap,2) + C(remainder,2) + bridges) -- one
    groupBy over the band rows, no pair materialization;
  * cand_per_vec = candidates / n -- the scaling-law readout: flat or
    gently growing per-octave = sublinear aggregate verify cost;
    linear growth = the r6 cap regime (SCALE_r06_300x.json);
  * verify_pairs: the DISTINCT pair count (what survives the pairs
    union's de-dup) when the candidate volume is small enough to
    count directly; null when skipped.

``--family strict`` bands the same corpus with the production-threshold
(cos >= 0.90) strict table instead — the SemDeDup-regime candidate
curve, ~5-10x fewer candidates at the same adaptive bit widths.

Usage:
    python scripts/lsh_cand_diag.py --dirs DIR... --out SCALE_r07_cands.json
    python scripts/lsh_cand_diag.py --family strict --out SCALE_r07_strict_cands.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from os___mapreduceframework_spark.operators.minhash import (
    LSH_BUCKET_CAP,
    bucket_pairs,
    canonical_embeddings,
    emb_adaptive_bands,
    emb_adaptive_bits,
    emb_strict_bands,
    embedding_band_buckets,
)
from os___mapreduceframework_spark.session import get_session

DEFAULT_DIRS = [
    "/root/testdata/sf0.1",
    "/tmp/spark_graft_scale/sf1.0",
    "/tmp/spark_graft_scale/sf10emb",
    "/tmp/spark_graft_scale/sf30emb",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="+", default=DEFAULT_DIRS)
    ap.add_argument("--out", default="SCALE_r07_cands.json")
    ap.add_argument(
        "--count-pairs-max",
        type=int,
        default=300_000_000,
        help="materialize the distinct pair count only when the "
        "arithmetic candidate volume is at or below this",
    )
    ap.add_argument(
        "--family",
        choices=["calibration", "strict"],
        default="calibration",
        help="band table: the 0.45-threshold calibration table "
        "(emb_adaptive_bands) or the 0.90 production-threshold strict "
        "table (emb_strict_bands)",
    )
    args = ap.parse_args()

    spark = get_session(app_name="lsh_cand_diag")
    cap = LSH_BUCKET_CAP
    bands_for = (
        emb_strict_bands if args.family == "strict" else emb_adaptive_bands
    )
    report = {"cap": cap, "family": args.family, "dirs": {}}
    for d in args.dirs:
        t0 = time.perf_counter()
        emb = canonical_embeddings(
            spark.read.parquet(os.path.join(d, "embeddings.parquet")).select(
                "vec_id", F.col("embedding").cast("array<double>").alias("e")
            )
        ).localCheckpoint(eager=False)
        n = emb.count()
        head = emb.select("e").filter(F.size("e") > 0).head()
        dim = len(head["e"]) if head else 0
        bands = embedding_band_buckets(
            emb,
            dim=dim,
            n_vectors=n,
            # pass the band count unconditionally (ADVICE r7): the
            # calibration family's internal default happens to BE
            # emb_adaptive_bands, but recording bands_for(n) below while
            # letting the callee re-derive its own would silently desync
            # if that default ever changed
            nbands=bands_for(n),
        )
        # exact capped-pairs arithmetic from bucket sizes: per bucket of
        # size m, (m // cap) full sub-buckets of C(cap,2) pairs, the
        # remainder's C(m % cap, 2), and ceil(m/cap) - 1 bridges
        sizes = bands.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("m")
        )
        row = sizes.select(
            F.sum(
                F.floor(F.col("m") / cap) * (cap * (cap - 1) // 2)
                + (F.col("m") % cap) * ((F.col("m") % cap) - 1) / 2
                + F.ceil(F.col("m") / cap)
                - 1
            ).alias("cands"),
            F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("uncapped"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("m").alias("max_bucket"),
        ).collect()[0]
        cands = int(row["cands"])
        diag_sec = round(time.perf_counter() - t0, 1)
        entry = {
            "n": n,
            "dim": dim,
            "nbits": emb_adaptive_bits(n),
            "nbands": bands_for(n),
            "candidates": cands,
            "uncapped_pairs": int(row["uncapped"]),
            "n_buckets": int(row["n_buckets"]),
            "max_bucket": int(row["max_bucket"]),
            "cand_per_vec": round(cands / n, 1) if n else None,
            "diag_sec": diag_sec,
            "verify_pairs": None,
        }
        if cands <= args.count_pairs_max:
            t1 = time.perf_counter()
            entry["verify_pairs"] = bucket_pairs(
                bands, "vec_id", ("band", "bucket")
            ).count()
            entry["verify_pairs_sec"] = round(time.perf_counter() - t1, 1)
        report["dirs"][d] = entry
        print(f"# {d}: {json.dumps(entry)}", file=sys.stderr, flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
