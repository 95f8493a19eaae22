"""Scale probe: measure the engine's scale-critical operators on
generated multi-million-row data (larger than the driver testdata).

This backs SCALING.md's claims with reproducible local numbers — the
skew-beating salted cumsum, broadcast-vs-shuffle dim lookup, and
IVF-vs-brute-force ANN pruning. Synthetic inputs are generated
distributed (spark.range — never driver-side lists) into a temp dir.

Usage: python tools/scale_probe.py [--rows 20000000] [--vectors 200000]
Prints one JSON line per probe plus a closing summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 2), out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--vectors", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from azuredataengineering_deeplearning_spark import get_spark
    from azuredataengineering_deeplearning_spark.operators import windows as W
    from azuredataengineering_deeplearning_spark.operators import similarity as SIM

    spark = get_spark(app_name="scale-probe")
    results: dict[str, float] = {}

    with tempfile.TemporaryDirectory() as tmp:
        # ---- skewed events: 50% of rows on ONE key --------------------
        ev_path = f"{tmp}/events"
        (
            spark.range(args.rows)
            .select(
                F.when(F.col("id") % 2 == 0, 0)
                .otherwise(F.col("id") % 1000)
                .alias("user_id"),
                F.col("id").alias("ts"),
                (F.rand(7) * 100).alias("value"),
            )
            .write.mode("overwrite").parquet(ev_path)
        )
        ev = spark.read.parquet(ev_path)

        t, _ = timed(
            lambda: W.cumsum(ev, ["user_id"], "ts", "value", out="c").count()
        )
        results["cumsum_plain_hotkey"] = t
        print(json.dumps({"probe": "cumsum_plain_hotkey", "rows": args.rows, "sec": t}))

        t, _ = timed(
            lambda: W.salted_cumsum(
                ev, ["user_id"], "ts", "value", out="c", salt_size=1_000_000
            ).count()
        )
        results["cumsum_salted_hotkey"] = t
        print(json.dumps({"probe": "cumsum_salted_hotkey", "rows": args.rows, "sec": t}))

        # ---- dim lookup: broadcast vs shuffled join -------------------
        dim = spark.range(1000).select(
            F.col("id").alias("user_id"), F.concat(F.lit("seg_"), F.col("id") % 7).alias("segment")
        )
        t, _ = timed(
            lambda: ev.join(F.broadcast(dim), "user_id").groupBy("segment").count().count()
        )
        results["dim_join_broadcast"] = t
        print(json.dumps({"probe": "dim_join_broadcast", "rows": args.rows, "sec": t}))

        t, _ = timed(
            lambda: ev.join(dim.hint("shuffle_hash"), "user_id").groupBy("segment").count().count()
        )
        results["dim_join_shuffled"] = t
        print(json.dumps({"probe": "dim_join_shuffled", "rows": args.rows, "sec": t}))

        # ---- ANN: brute force vs IVF pruning --------------------------
        vec_path = f"{tmp}/vectors"
        (
            spark.range(args.vectors)
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(args.dim)),
                    lambda i: F.sin(F.col("id") * i + i).cast("float"),
                ).alias("embedding"),
            )
            .write.mode("overwrite").parquet(vec_path)
        )
        vecs = spark.read.parquet(vec_path)
        queries = vecs.filter(F.col("vec_id") < 16)

        t, _ = timed(lambda: SIM.numpy_topk(vecs, queries, k=10).count())
        results["ann_bruteforce_numpy"] = t
        print(json.dumps({"probe": "ann_bruteforce_numpy", "vectors": args.vectors, "sec": t}))

        t_fit, cents = timed(
            lambda: SIM.fit_ivf_centroids(
                vecs, n_lists=64, seed=42, max_iter=5, sample_fraction=0.1
            )
        )
        results["ivf_fit"] = t_fit
        print(json.dumps({"probe": "ivf_fit", "vectors": args.vectors, "sec": t_fit}))

        t, _ = timed(
            lambda: SIM.ivf_ann_topk(vecs, queries, cents, k=10, nprobe=8).count()
        )
        results["ann_ivf_nprobe8_of_64"] = t
        print(json.dumps({"probe": "ann_ivf_nprobe8_of_64", "vectors": args.vectors, "sec": t}))

    print(
        json.dumps(
            {
                "metric": "scale_probe",
                "rows": args.rows,
                "vectors": args.vectors,
                "results": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
