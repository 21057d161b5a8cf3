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

# the constraint-eval probe workload (BASELINE.json metric "validated
# clips/sec"): ONE definition imported by both bench.py and
# tools/scaling_probe.py, so the headline throughput and the N-vs-4N
# scaling evidence can never silently measure different predicate sets
# (review r05c — the dict was previously copy-pasted in both files)
CLIPS_CONSTRAINT_SCHEMA = {
    "type": "object",
    "properties": {
        "clip_id": {"type": "string", "pattern": "^clip_[0-9a-f]{12}$"},
        "sr_hz": {"enum": [8000, 16000, 22050, 44100, 48000]},
        "dur_ms": {"type": "integer", "minimum": 1, "maximum": 600000},
        "codec": {"enum": ["pcm_s16le", "flac", "opus"]},
        "transcript": {"type": "string", "minLength": 1},
    },
    "required": ["clip_id", "sr_hz", "dur_ms", "codec", "transcript"],
}


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
    # one draw regardless of inject (byte-stable rng stream; the injection
    # override below is what actually changes codecs)
    codec = str(rng.choice(_CODECS, p=[0.985, 0.01, 0.005]))
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


def clips_df_fast(spark: SparkSession, n: int, *, inject: bool = True,
                  seed: int = SEED, partitions: int | None = None) -> DataFrame:
    """Bench-scale clips table generated with *pure Column expressions* —
    whole-stage codegen, no Python anywhere, tens of millions of rows in
    seconds. Same schema + violation classes as ``clips_df`` (FIXTURES.md §1)
    but hash-derived distributions (the constraint-eval probe only needs the
    predicate mix, not the exact lognormal); ``bytes`` is empty (audio rows
    come from ``clips_df``). Deterministic in (n, seed), independent of
    partitioning — the property the local[8]-vs-local[32] scaling evidence
    relies on."""
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    sid = F.col("id")

    def h(salt: int):
        return F.xxhash64(sid, F.lit(seed), F.lit(salt))

    def u(salt: int):
        return F.pmod(h(salt), F.lit(1_000_000)) / 1_000_000.0

    dup = (u(0) < 0.005) & (sid > 0) if inject else F.lit(False)
    clip_src = F.when(dup, F.pmod(h(1), F.greatest(sid, F.lit(1)))).otherwise(sid)
    clip_id = F.format_string("clip_%012x", clip_src)

    p = u(2)
    sr = (F.when(p < 0.1, 8000).when(p < 0.5, 16000).when(p < 0.6, 22050)
          .when(p < 0.8, 44100).otherwise(48000))
    if inject:
        bad_sr = F.when(F.pmod(h(4), F.lit(3)) == 0, 11025) \
            .when(F.pmod(h(4), F.lit(3)) == 1, 0).otherwise(-1)
        sr = F.when(u(3) < 0.005, bad_sr).otherwise(sr)

    # approx-normal via Irwin-Hall(4): mean 2, var 1/3 -> z ~ N(0,1)
    z = (u(5) + u(6) + u(7) + u(8) - F.lit(2.0)) * F.lit(1.7320508)
    dur = F.least(F.greatest(F.exp(F.lit(7.0) + F.lit(0.8) * z), F.lit(200.0)),
                  F.lit(30000.0)).cast("int")
    if inject:
        dur = F.when(u(9) < 0.005,
                     F.when(F.pmod(h(9), F.lit(2)) == 0, 0).otherwise(7_200_000)
                     ).otherwise(dur)

    pc = u(10)
    codec = (F.when(pc < 0.985, "pcm_s16le").when(pc < 0.995, "flac")
             .otherwise("opus"))
    if inject:
        codec = F.when(u(11) < 0.005,
                       F.when(F.pmod(h(11), F.lit(2)) == 0, "mp3").otherwise("")
                       ).otherwise(codec)

    words = F.array(*[F.lit(w) for w in _WORDS])
    nw = (F.pmod(h(12), F.lit(38)) + 3).cast("int")
    transcript = F.array_join(
        F.transform(F.sequence(F.lit(1), nw),
                    # the seed MUST thread through the word draw like every
                    # other h() draw: without it two different-seed tables
                    # share position-wise identical word streams and only
                    # differ in length (review r05c)
                    lambda j: F.element_at(words, (F.pmod(
                        F.xxhash64(sid, F.lit(seed), j),
                        F.lit(256)) + 1).cast("int"))),
        " ")
    if inject:
        transcript = F.when(u(13) < 0.01,
                            F.when(F.pmod(h(13), F.lit(2)) == 0, F.lit(""))
                            .otherwise(F.lit(None).cast("string"))
                            ).otherwise(transcript)

    return df.select(
        clip_id.alias("clip_id"),
        F.lit(b"").alias("bytes"),
        sr.cast("int").alias("sr_hz"),
        dur.alias("dur_ms"),
        codec.alias("codec"),
        transcript.alias("transcript"),
    )


def ensure_clips_parquet(spark: SparkSession, n: int, *, audio: bool = False,
                         seed: int = SEED, base_dir: str = "/tmp/jss_bench",
                         partitions: int | None = None) -> str:
    """Materialize a deterministic clips table as parquet once and reuse it
    across bench runs / parallelism levels (identical input is what makes the
    N-vs-4N comparison valid). Returns the path."""
    import os
    kind = "audio" if audio else "fast"
    # "z" = zstd layout (r06): PCM16 payloads compress 2.5x better under
    # zstd than snappy (2.1 GB -> 840 MB at 40k clips) and the probe scan
    # floor halves (1.4 s -> 0.65 s); values are identical — compression
    # never changes data. The suffix keys the layout so a pre-r06 snappy
    # directory is never silently reused for the measurement.
    path = f"{base_dir}/clips_{kind}_{n}_s{seed}z"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        parts = partitions or max(spark.sparkContext.defaultParallelism * 4, 64)
        df = (clips_df(spark, n, audio=True, inject=True, seed=seed,
                       partitions=parts) if audio
              else clips_df_fast(spark, n, inject=True, seed=seed,
                                 partitions=parts))
        df.write.mode("overwrite").option("compression", "zstd").parquet(path)
    return path


def transcripts_ref_df(spark: SparkSession, n: int, *, seed: int = SEED,
                       inject: bool = True,
                       partitions: int | None = None) -> DataFrame:
    """Referential side table (FIXTURES.md §2): clips ids minus a 0.3%
    sample (orphan clips) plus 0.1% ids never in clips (dangling refs);
    0.2% transcripts mutated by one word.

    ``inject`` must MATCH the ``clips_df(inject=...)`` table this ref will
    be joined against: the injection overrides in ``_make_row`` consume
    extra rng draws, so an inject=True ref against an inject=False clips
    table diverges on ~1% of ids/transcripts — spurious orphan and
    mismatch violations beyond the documented rates (review r04)."""
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
                                                        inject=inject,
                                                        seed=seed)
                if u[1] < 0.002 and transcript:
                    parts = transcript.split(" ")
                    parts[int(u[2] * len(parts))] = "MUTATED"
                    transcript = " ".join(parts)
                out["clip_id"].append(cid)
                out["transcript"].append(transcript)
                out["lang"].append(["en", "de", "hu"][int(u[3] * 3)])
                if u[0] > 0.999:  # ~0.1% dangling refs
                    # offset 2^47 keeps the dangling id space disjoint
                    # from real ids (i < n) for any n < 1.4e14 — a 10**9
                    # offset collides with real ids once n > 10**9
                    # (review r04); still 12 hex chars (48-bit max)
                    out["clip_id"].append(f"clip_{((1 << 47) + i):012x}")
                    out["transcript"].append("dangling")
                    out["lang"].append("en")
            yield pd.DataFrame(out)

    return rng_range.mapInPandas(gen, "clip_id string, transcript string, lang string")
