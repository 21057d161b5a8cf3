"""Deterministic synthetic ``clips`` table (FIXTURES.md §1) + side tables.

Generated *distributed* (spark.range -> mapInPandas) so bench-scale tables
never bottleneck on the driver; every row is a pure function of its index
and the seed, so the data is identical under any partitioning / parallelism
— the property the local[8]-vs-local[32] scaling evidence depends on.

Violation injection rates follow FIXTURES.md §1 (duplicate clip_ids, invalid
sr_hz / dur_ms / codec, corrupted WAV payloads, empty transcripts).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from json_skema_spark.functions.audio import encode_wav_pcm16, synth_reference_signal

SEED = 42
_SR_CHOICES = np.array([8000, 16000, 22050, 44100, 48000])
_SR_WEIGHTS = np.array([0.1, 0.4, 0.1, 0.2, 0.2])
_BAD_SR = np.array([11025, 0, -1])
_CODECS = np.array(["pcm_s16le", "flac", "opus"])
_WORDS = [f"w{j:03d}" for j in range(256)]

CLIPS_SCHEMA = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
                "codec string, transcript string")


def _row_rng(i: int, seed: int = SEED) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, i]))


def _make_row(i: int, *, audio: bool, inject: bool, seed: int = SEED):
    rng = _row_rng(i, seed)
    clip_id = f"clip_{i:012x}"
    u = rng.random(8)
    if inject and u[0] < 0.005 and i > 0:  # ~0.5% duplicate ids
        clip_id = f"clip_{int(i * u[1]):012x}"
    sr = int(rng.choice(_SR_CHOICES, p=_SR_WEIGHTS))
    if inject and u[2] < 0.005:
        sr = int(rng.choice(_BAD_SR))
    dur = int(np.clip(rng.lognormal(7.0, 0.8), 200, 30000))
    if inject and u[3] < 0.005:
        dur = int(rng.choice([0, 7_200_000]))
    codec = str(rng.choice(_CODECS, p=[0.985, 0.01, 0.005])) if not inject \
        else str(rng.choice(_CODECS, p=[0.985, 0.01, 0.005]))
    if inject and u[4] < 0.005:
        codec = str(rng.choice(np.array(["mp3", ""])))
    nw = int(rng.integers(3, 41))
    words = rng.integers(0, 256, nw)
    transcript = " ".join(_WORDS[w] for w in words)
    if inject and u[5] < 0.01:
        transcript = "" if u[6] < 0.5 else None
    if audio:
        synth_sr = sr if sr >= 8000 else 8000
        synth_dur = min(dur, 2000) if dur > 0 else 200
        sig = synth_reference_signal(i, synth_sr, synth_dur)
        buf = encode_wav_pcm16(sig, synth_sr)
        if inject and u[7] < 0.01:  # ~1% corrupted payloads
            buf = buf[: max(len(buf) // 3, 10)]
    else:
        buf = b""
    return clip_id, bytearray(buf), sr, dur, codec, transcript


def clips_df(spark: SparkSession, n: int, *, audio: bool = True,
             inject: bool = True, seed: int = SEED,
             partitions: int | None = None) -> DataFrame:
    """The clips table: ``(clip_id, bytes, sr_hz, dur_ms, codec, transcript)``."""
    rng_range = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_make_row(int(i), audio=audio, inject=inject, seed=seed)
                    for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["clip_id", "bytes", "sr_hz", "dur_ms",
                               "codec", "transcript"])

    return rng_range.mapInPandas(gen, CLIPS_SCHEMA)


def transcripts_ref_df(spark: SparkSession, n: int, *, seed: int = SEED,
                       partitions: int | None = None) -> DataFrame:
    """Referential side table (FIXTURES.md §2): clips ids minus a 0.3%
    sample (orphan clips) plus 0.1% ids never in clips (dangling refs);
    0.2% transcripts mutated by one word."""
    rng_range = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"clip_id": [], "transcript": [], "lang": []}
            for i in pdf["id"]:
                i = int(i)
                rng = _row_rng(i, seed + 1)
                u = rng.random(4)
                if u[0] < 0.003:
                    continue  # omitted -> orphan clip
                cid, _, _, _, _, transcript = _make_row(i, audio=False,
                                                        inject=True, seed=seed)
                if u[1] < 0.002 and transcript:
                    parts = transcript.split(" ")
                    parts[int(u[2] * len(parts))] = "MUTATED"
                    transcript = " ".join(parts)
                out["clip_id"].append(cid)
                out["transcript"].append(transcript)
                out["lang"].append(["en", "de", "hu"][int(u[3] * 3)])
                if u[0] > 0.999:  # ~0.1% dangling refs
                    out["clip_id"].append(f"clip_{(10**9 + i):012x}")
                    out["transcript"].append("dangling")
                    out["lang"].append("en")
            yield pd.DataFrame(out)

    return rng_range.mapInPandas(gen, "clip_id string, transcript string, lang string")
