"""sf0.1 -> sf10 (100x) scale probes for the round-10 operators
(BASELINE.md round-10 table). Methodology as prior rounds: honest
keyed replica (tools/make_sf_replica.py), warm min-of-2, noop-write
materialization, solo.

Rows whose gate form caps its probe set (sitemap < 400, image < 400,
audio < 150, video < 200, semdedup vec < 600) are probed through the
same operator chain with the cap LIFTED 100x at sf10, so the work
ratio is a true 100x; semdedup scales k with the corpus (8 -> 800) so
mean cluster size stays constant — the paper's own scaling knob, and
the honest way to probe (fixed k at 100x data would grow within-
cluster pair work quadratically by construction).

Usage: python tools/probe_r10.py [probe ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from malstrom_spark.session import build_session  # noqa: E402
from malstrom_spark.queries import full_registry, table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF10 = "/tmp/testdata/sf10"

# rows whose gate form already scales with the tables
DIRECT = [
    "doc_dsir_selected",
    "crawl_frontier_batch",
    "doc_bm25_updated",
    "doc_leakage_safe_split",
]


def _sitemap(spark, sf_dir, mult):
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType,
    )

    from malstrom_spark.functions import sitemap as sm
    from malstrom_spark.queries.pipeline import _seeded_sitemap_batches

    docs = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400 * mult
    )
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("sitemap_url", StringType()),
        StructField("payload", BinaryType()),
    ])
    seeded = docs.mapInPandas(_seeded_sitemap_batches, schema)
    return sm.sitemap_entries(
        seeded, "payload", sitemap_url_col="sitemap_url"
    ).drop("sitemap_url")


def _image(spark, sf_dir, mult):
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from malstrom_spark.functions import multimodal as mm
    from malstrom_spark.queries.pipeline import _seeded_image_batches

    docs = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400 * mult
    )
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ])
    imgs = docs.mapInPandas(_seeded_image_batches, schema)
    hashed = mm.image_phash(imgs, "payload").drop("payload")
    return mm.phash_near_dup_pairs(hashed, "doc_id", max_hamming=3)


def _audio(spark, sf_dir, mult):
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from malstrom_spark.functions import multimodal as mm
    from malstrom_spark.queries.pipeline import _seeded_wav_batches

    docs = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 150 * mult
    )
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ])
    clips = docs.mapInPandas(_seeded_wav_batches, schema)
    fps = mm.audio_fingerprints(clips, "payload")
    return mm.audio_match_pairs(fps, "doc_id", min_matches=8)


def _video(spark, sf_dir, mult):
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from malstrom_spark.functions import multimodal as mm
    from malstrom_spark.queries.pipeline import _seeded_avi_batches

    docs = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200 * mult
    )
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ])
    vids = docs.mapInPandas(_seeded_avi_batches, schema)
    frames = mm.frame_sample_mjpeg(vids, "payload", every_n=2)
    return mm.image_phash(frames, "frame")


def _semdedup(spark, sf_dir, mult):
    from malstrom_spark.functions import similarity as sim

    emb = table(spark, sf_dir, "embeddings")
    k = 8 * mult  # constant mean cluster size across the scale-up
    cents = sim.semdedup_head_centroids(emb, "vec_id", "embedding", k)
    return sim.semdedup(emb, "vec_id", "embedding", cents, threshold=0.5)


CUSTOM = {
    "sitemap_uncapped": _sitemap,
    "image_phash_jpeg": _image,
    "audio_pairs": _audio,
    "video_phash": _video,
    "semdedup_scaled_k": _semdedup,
}


def main():
    only = set(sys.argv[1:])
    spark = build_session(app_name="probe-r10")
    fr = full_registry()

    def run(name, build):
        line = [name]
        for sf_dir, mult in ((SF01, 1), (SF10, 100)):
            times, rows = [], None
            for _ in range(2):
                t0 = time.time()
                df = build(sf_dir, mult)
                df.write.format("noop").mode("overwrite").save()
                times.append(time.time() - t0)
            line.append(f"{sf_dir.split('/')[-1]}: {min(times):.2f}s")
        print(" | ".join(line), flush=True)

    for name in DIRECT:
        if only and name not in only:
            continue
        run(name, lambda sf_dir, mult, n=name: fr[n].fn(spark, sf_dir))
    for name, fn in CUSTOM.items():
        if only and name not in only:
            continue
        run(name, lambda sf_dir, mult, f=fn: f(spark, sf_dir, mult))


if __name__ == "__main__":
    main()
