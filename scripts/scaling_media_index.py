"""Incremental perceptual-dedup scaling: MediaIndex.update on growing
corpora.

The media index's incremental claim (multimodal.MediaIndex.update /
append_saved) is that absorbing a FIXED-SIZE media delta costs
O(|delta| decode + |delta|·bands join) — the delta is the only thing
decoded (the one Arrow stage), its bands join the merged band view,
verification reads stored hashes, cluster labels re-propagate from
star seeds — never an old-blob re-decode or corpus re-mine. This
measures it: for each corpus size the script builds and saves the
index over N synthetic blobs (the rebuild-cost proxy), then times a
load() + update() + append_saved() round with the SAME 100-blob
delta (fresh ids above the corpus max; synthetic payloads, so the
deltas are realistically distributed near-dups of existing blobs).
If the design holds, build time grows with the corpus while the
fixed-delta update stays ~flat.

The synthetic corpus is ADVERSARIAL by construction: formula-generated
payloads collapse onto few distinct aHashes as n grows, piling
thousands of rows into hot (band, key) groups — uncapped mining at
n=12800 measured 1.8M candidate expansions and a >20-round component
graph. That is the shape max_band_size exists for, so the curve runs
capped (CAP below); the cap's exactness contract is test-asserted
separately (tests/test_media_index.py::test_band_cap_is_definitional*).

Usage: python scripts/scaling_media_index.py
Prints a markdown table plus one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = (200, 1600, 12800)
N_DELTA = 100
CAP = 128  # max_band_size — see module docstring


def main() -> None:
    from pyspark.sql import functions as F

    from lp_etl_plugins_spark.multimodal import MediaIndex, synthetic_media
    from lp_etl_plugins_spark.session import get_spark

    spark = get_spark("scaling-media-index", cpus=os.cpu_count() or 8)
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="scaling_midx_")
    rows = []
    try:
        for n in SIZES:
            # corpus: n synthetic blobs, spread over the cores so the
            # Arrow decode parallelizes like a real ingest
            corpus_path = os.path.join(base, f"n{n}", "media")
            synthetic_media(spark, n).repartition(
                spark.sparkContext.defaultParallelism
            ).write.mode("overwrite").parquet(corpus_path)
            corpus = spark.read.parquet(corpus_path)
            # delta: fresh ids above the corpus, payloads re-derived
            # from low generator indices (dense near-dups of existing
            # blobs — the adversarial direction for the band join)
            delta = (
                synthetic_media(spark, N_DELTA)
                .withColumn("media_id", F.col("media_id") + F.lit(n) + 1)
                .localCheckpoint()
            )
            idx_path = os.path.join(base, f"n{n}", "index")

            t0 = time.perf_counter()
            MediaIndex(corpus, max_band_size=CAP).save(idx_path)
            build_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            live = MediaIndex.load(spark, idx_path)
            live.update(delta)
            live.append_saved(idx_path)
            update_s = time.perf_counter() - t0

            re = MediaIndex.load(spark, idx_path)
            assert re.max_id == n + N_DELTA, re.max_id
            rows.append((n, round(build_s, 2), round(update_s, 2)))
            print(
                f"# n={n}: build+save {build_s:.2f}s, "
                f"load+update+append {update_s:.2f}s",
                file=sys.stderr,
            )

        print("| blobs | build + save (s) | load + update + append (s) |")
        print("|---|---|---|")
        for n, b, u in rows:
            print(f"| {n} | {b} | {u} |")
        grow = len(SIZES) > 1 and SIZES[-1] / SIZES[0]
        a_build = math.log(rows[-1][1] / rows[0][1]) / math.log(grow)
        a_upd = math.log(max(rows[-1][2], 1e-3) / max(rows[0][2], 1e-3)) / math.log(grow)
        print(f"\nalpha(build) = {a_build:.2f}, alpha(update) = {a_upd:.2f}")
        print(json.dumps({
            "sizes": SIZES, "rows": rows,
            "alpha_build": round(a_build, 2), "alpha_update": round(a_upd, 2),
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
