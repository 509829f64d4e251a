"""Audio-operator scaling evidence (BASELINE.md protocol, round 2).

Measures the round-2 audio payload operators — spectral fingerprinting
(decode + framed FFT + SimHash, the acoustic near-dup signature stage) and
energy-VAD segmentation — at two parallelism levels on the SAME
pre-generated input, reporting throughput at both plus N->4N efficiency
(the sandbox substitute for the north_rule's two-cluster-size criterion,
same as bench_scaling.py).

The corpus is its own (not the 64M-row validation corpus): payload ops
need realistic clip lengths — the validation corpus's 8 ms payloads are
shorter than one analysis frame, so fingerprints there are all NULL by
design. 2M clips x 100 ms across the 8-48 kHz sr domain gives ~200
core-seconds of real decode+FFT work, enough for work to dominate fixed
overhead (BASELINE.md methodology finding #1).

Usage:
  python bench_audio_scaling.py prepare [--rows 2000000 --audio-ms 100]
  python bench_audio_scaling.py run --master local[8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from remark_lint_frontmatter_schema_spark.functions import audio  # noqa: E402
from remark_lint_frontmatter_schema_spark.session import get_spark  # noqa: E402
from remark_lint_frontmatter_schema_spark.sources import fixtures  # noqa: E402

DATA_DIR = "/root/repo/.bench/clips_audio"
# 100 ms clips: frame/hop sized so every sr in the domain yields ~9-11
# frames (flen = sr*16ms >= 128 samples at 8 kHz, the decode minimum)
FRAME_MS, HOP_MS = 16, 8


def prepare(rows: int, audio_ms: int, partitions: int = 64) -> None:
    spark = get_spark(app_name="rlfs-audio-prepare")
    spark.sparkContext.setLogLevel("ERROR")
    clips = fixtures.generate_clips(spark, rows, audio_ms=audio_ms,
                                    num_partitions=partitions)
    (clips.select("clip_id", "bytes").repartition(partitions)
          .write.mode("overwrite").parquet(DATA_DIR))
    n = spark.read.parquet(DATA_DIR).count()
    print(json.dumps({"prepared_rows": n, "data_dir": DATA_DIR,
                      "audio_ms": audio_ms}))
    spark.stop()


def run(master: str, reps: int = 4) -> dict:
    cores = int(master.split("[")[1].rstrip("]")) if "[" in master else 8
    spark = get_spark(master=master, app_name=f"rlfs-audio-{master}",
                      shuffle_partitions=cores,
                      extra_conf={"spark.driver.memory": f"{cores}g"})
    spark.sparkContext.setLogLevel("ERROR")
    clips = spark.read.parquet(DATA_DIR)
    n_rows = clips.count()  # warms file listing metadata

    def fp_agg():
        return (audio.audio_fingerprints(clips, frame_ms=FRAME_MS,
                                         hop_ms=HOP_MS)
                .agg(F.count("*").alias("n"),
                     F.count("fp").alias("n_fp"),
                     F.approx_count_distinct("fp").alias("n_distinct")))

    def seg_agg():
        return (audio.voiced_segments(clips, frame_ms=FRAME_MS)
                .agg(F.count("*").alias("n_segs"),
                     F.countDistinct("clip_id").alias("n_clips")))

    def lufs_agg():
        # round 3: BS.1770 K-weighted gated loudness — two IIR cascades +
        # block gating per clip, the heaviest pure-numpy stage per byte
        return (audio.audio_features(clips, with_loudness=True)
                .agg(F.count("*").alias("n"),
                     F.count("integrated_lufs").alias("n_lufs"),
                     F.avg("integrated_lufs").alias("mean_lufs")))

    def canon_agg():
        # decode -> downmix -> sinc resample to 16 kHz -> re-encode; the
        # agg reads bytes length so the encode stage is genuinely forced
        return (audio.canonicalize_clips(clips, target_sr=16000)
                .agg(F.count("*").alias("n"),
                     F.sum("n_samples").alias("total_samples"),
                     F.sum(F.length("bytes")).alias("total_bytes")))

    def best_of(make_agg, label):
        # a FRESH DataFrame per rep: re-collecting one plan object lets
        # Spark reuse the map stage's shuffle files across jobs, so every
        # rep after the first would skip the decode+FFT work entirely
        # (measured: 2M clips "in" 0.07 s) and time only the final stage
        make_agg().collect()  # warm: Python workers + Arrow + page cache
        times, result = [], None
        for _ in range(reps):
            t0 = time.perf_counter()
            result = make_agg().collect()[0]
            times.append(time.perf_counter() - t0)
        return min(times), [round(t, 2) for t in times], result

    fp_best, fp_times, fp_res = best_of(fp_agg, "fingerprint")
    seg_best, seg_times, seg_res = best_of(seg_agg, "segments")
    lu_best, lu_times, lu_res = best_of(lufs_agg, "loudness")
    can_best, can_times, can_res = best_of(canon_agg, "canonicalize")

    out = {
        "master": master,
        "n_rows": n_rows,
        "fingerprint_sec": round(fp_best, 2),
        "fingerprint_clips_per_sec": round(n_rows / fp_best, 1),
        "fingerprint_runs_sec": fp_times,
        "n_fp_nonnull": fp_res.n_fp,
        "n_fp_distinct": fp_res.n_distinct,
        "segments_sec": round(seg_best, 2),
        "segments_clips_per_sec": round(n_rows / seg_best, 1),
        "segments_runs_sec": seg_times,
        "n_segments": seg_res.n_segs,
        "loudness_sec": round(lu_best, 2),
        "loudness_clips_per_sec": round(n_rows / lu_best, 1),
        "loudness_runs_sec": lu_times,
        "n_lufs_nonnull": lu_res.n_lufs,
        "mean_lufs": round(float(lu_res.mean_lufs), 2) if lu_res.mean_lufs is not None else None,
        "canonicalize_sec": round(can_best, 2),
        "canonicalize_clips_per_sec": round(n_rows / can_best, 1),
        "canonicalize_runs_sec": can_times,
        "n_canonical": can_res.n,
        "canonical_samples": can_res.total_samples,
        "canonical_bytes": can_res.total_bytes,
    }
    print(json.dumps(out))
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["prepare", "run"])
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--audio-ms", type=int, default=100)
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    if args.mode == "prepare":
        prepare(args.rows, args.audio_ms)
    else:
        run(args.master, reps=args.reps)


if __name__ == "__main__":
    main()
