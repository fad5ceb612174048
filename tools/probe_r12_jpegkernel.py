"""Deterministic kernel-level A/B for the JPEG decode chain (round
12, session 2). Replicates the video_frame_phash seeding (4-frame
MJPEG AVI per doc, 32x32, quality 95) plus the larger
image_phash_near_dup stills, times decode_jpeg_pixels per frame, and
cProfiles the hot path. Pure Python/numpy — host-noise shows up as a
scale factor on BOTH sides of any A/B run back to back; outputs are
compared bit-exactly via hashes.

Usage: python tools/probe_r12_jpegkernel.py [ndocs]
"""

from __future__ import annotations

import cProfile
import hashlib
import io
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from malstrom_spark.functions import multimodal as mm  # noqa: E402


def blur(a, k=2):
    out = a.astype(float)
    for _ in range(k):
        out = (np.roll(out, 1, 0) + np.roll(out, -1, 0)
               + np.roll(out, 1, 1) + np.roll(out, -1, 1) + out) / 5.0
    return out


def seeded_frames(ndocs):
    frames = []
    for did in range(ndocs):
        r = np.random.RandomState(did % 20)
        base = blur(r.randint(0, 256, (32, 32)))
        for i in range(4):
            frames.append(np.stack(
                [(base + 3 * i).clip(0, 255).astype(np.uint8)] * 3, axis=2))
    return frames


def main():
    ndocs = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    frames = seeded_frames(ndocs)
    jpegs = [mm.make_jpeg(f, quality=95) for f in frames]
    # larger stills like _seeded_image_batches uses (64x64 at q85)
    big = [mm.make_jpeg(
        np.stack([(blur(np.random.RandomState(s).randint(0, 256, (64, 64)))
                   ).clip(0, 255).astype(np.uint8)] * 3, axis=2), quality=85)
        for s in range(20)]

    def run_all():
        h = hashlib.sha256()
        for j in jpegs + big:
            h.update(mm.decode_jpeg_pixels(j).tobytes())
        return h.hexdigest()

    run_all()  # warm
    t0 = time.perf_counter()
    digest = run_all()
    dt = time.perf_counter() - t0
    n = len(jpegs) + len(big)
    print(f"decode: {n} frames in {dt:.3f}s = {1000 * dt / n:.2f} ms/frame")
    print(f"sha256(all pixels) = {digest}")

    pr = cProfile.Profile()
    pr.enable()
    run_all()
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
    print(s.getvalue())


if __name__ == "__main__":
    main()
