"""Round-12 A/B attribution of the audio_fingerprint_pairs bench move
(BENCH_r10 2.44 s -> BENCH_r11 3.63 s, +49%, the one r11 move outside
the host-noise band with no interleaved attribution).

Hypothesis: commit 3233449 added the exact-copy collapse to
audio_match_pairs, which consumes the input fingerprint frame in TWO
extra places (signature groupBy + rep semi-join). The bench row's
fingerprints are an expensive synthesized lineage (WAV gen + STFT via
mapInPandas), and Spark recomputes that lineage once per consumer:
3 passes before the collapse (hot-fp count + both self-join sides),
5 after -> 5/3 = +67% on the fingerprint stage, ~the observed move.
The md5-vs-xxhash signature swap (05dd662) rides on a per-clip
aggregate and should be noise.

Variants, interleaved A/B/C per round (the round-5/7 discipline):
  A = HEAD (collapse on, lazy lineage)            — the regressed form
  B = collapse OFF                                 — r10's pass count
  C = collapse on + fps.localCheckpoint(eager)     — the candidate fix

Usage: python tools/probe_r12_audio.py [rounds]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def build_fps(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from malstrom_spark.functions import multimodal as mm
    from malstrom_spark.queries import table
    from malstrom_spark.queries.pipeline import _seeded_wav_batches

    docs = table(spark, SF_DIR, "documents").select("doc_id").where(
        F.col("doc_id") < 150
    )
    schema = StructType([
        StructField("doc_id", LongType()), StructField("payload", BinaryType()),
    ])
    clips = docs.mapInPandas(_seeded_wav_batches, schema)
    return mm.audio_fingerprints(clips, "payload")


def run(spark, variant: str) -> float:
    from malstrom_spark.functions import multimodal as mm

    fps = build_fps(spark)
    t0 = time.time()
    if variant == "A":
        out = mm.audio_match_pairs(fps, "doc_id", min_matches=8)
    elif variant == "B":
        out = mm.audio_match_pairs(
            fps, "doc_id", min_matches=8, collapse_exact=False
        )
    elif variant == "C":
        out = mm.audio_match_pairs(
            fps.localCheckpoint(eager=True), "doc_id", min_matches=8
        )
    else:
        raise ValueError(variant)
    out.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from malstrom_spark.session import build_session

    spark = build_session(app_name="probe-r12-audio")
    # one warmup (JIT/codegen) not charged to any variant
    run(spark, "B")
    times: dict[str, list[float]] = {"A": [], "B": [], "C": []}
    for _ in range(rounds):
        for v in ("A", "B", "C"):
            times[v].append(run(spark, v))
    for v, ts in times.items():
        print(f"{v}: {[round(t, 2) for t in ts]} min={min(ts):.2f}")


if __name__ == "__main__":
    main()
