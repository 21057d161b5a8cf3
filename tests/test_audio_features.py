"""Audio feature extraction / resample / frame-sample / duration checks."""

import numpy as np
from pyspark.sql import functions as F

from json_skema_spark.functions import audio
from json_skema_spark.functions.audio_features import (
    clip_features, duration_consistency_violations, extract_features,
    frame_signal, resample_clips, resample_linear, sample_frames)
from json_skema_spark.sources import clips as clips_src


def test_resample_linear_preserves_tone():
    sr1, sr2 = 48000, 16000
    sig = audio.synth_reference_signal(0, sr1, 500)
    r = resample_linear(sig, sr1, sr2)
    assert abs(len(r) - len(sig) * sr2 / sr1) <= 1
    # downsampled 220 Hz tone must still correlate with a freshly
    # synthesized 16 kHz version
    ref = audio.synth_reference_signal(0, sr2, 500)
    n = min(len(r), len(ref))
    corr = np.corrcoef(r[:n], ref[:n])[0, 1]
    assert corr > 0.99


def test_frame_signal_shapes():
    sig = np.arange(1000, dtype=float)
    frames = frame_signal(sig, 100, 50)
    assert frames.shape == (19, 100)
    assert frames[1][0] == 50.0


def test_clip_features_sane():
    sig = audio.synth_reference_signal(3, 16000, 1000)
    f = clip_features(sig, 16000)
    assert f["n_frames"] > 90
    # 220 Hz tone: centroid near the low end, rms ~ -5 dBFS for 0.75 peak mix
    assert 150 < np.median(f["spectral_centroid"]) < 700
    assert -12 < np.median(f["rms_db"]) < -2


def test_extract_features_df(spark):
    df = clips_src.clips_df(spark, 30, inject=False)
    out = extract_features(df).collect()
    assert len(out) == 30
    ok = [r for r in out if r.n_frames > 0]
    assert len(ok) >= 25  # flac/opus stubs yield n_frames=0
    assert all(len(r.rms_db) == r.n_frames for r in ok)


def test_resample_clips_df(spark):
    df = clips_src.clips_df(spark, 10, inject=False)
    out = resample_clips(df, 8000).filter(F.col("n_samples") > 0).collect()
    assert out and all(r.sr_hz == 8000 for r in out)
    assert all(len(r.pcm) == 2 * r.n_samples for r in out)


def test_sample_frames_df(spark):
    df = clips_src.clips_df(spark, 10, inject=False)
    out = sample_frames(df, every_ms=200, frame_ms=50, max_frames=4).collect()
    assert out
    by_clip = {}
    for r in out:
        by_clip.setdefault(r.clip_id, []).append(r)
    for rows in by_clip.values():
        assert len(rows) <= 4
        assert [r.frame_idx for r in sorted(rows, key=lambda x: x.frame_idx)] \
            == list(range(len(rows)))


def test_duration_consistency(spark):
    # fixture audio is capped at 2000ms; rows claiming more must be flagged
    df = clips_src.clips_df(spark, 60, inject=False)
    long_claims = df.filter(F.col("dur_ms") > 2100).count()
    v = duration_consistency_violations(df).collect()
    assert len(v) == long_claims
    assert all("claimed duration" in r.message for r in v)


def test_audio_quality_stats_and_violations(spark):
    """Clipped (gain-damaged), near-silent, and normal clips must be told
    apart by the content-quality stats; violations fire on the bad two."""
    import numpy as np
    from json_skema_spark.functions import audio, audio_features

    sr = 16000
    tone = audio.synth_reference_signal(3, sr, 500)
    clipped = np.clip(tone * 4.0, -1.0, 1.0)            # heavy clipping
    silent = np.zeros(sr // 2)
    rows = [
        ("ok", audio.encode_wav_pcm16(tone, sr), "pcm_s16le"),
        ("clip", audio.encode_wav_pcm16(clipped, sr), "pcm_s16le"),
        ("quiet", audio.encode_wav_pcm16(silent, sr), "pcm_s16le"),
        ("bad", b"notawav", "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    stats = {r.clip_id: r for r in audio_features.audio_quality_stats(df).collect()}
    assert stats["ok"].decode_ok and stats["ok"].clipping_ratio < 0.001
    assert stats["clip"].clipping_ratio > 0.1
    assert stats["quiet"].silence_ratio == 1.0 and stats["quiet"].rms_dbfs <= -180
    assert not stats["bad"].decode_ok and stats["bad"].peak_dbfs is None
    v = {r.row_key: r.message
         for r in audio_features.audio_quality_violations(df).collect()}
    assert set(v) == {"clip", "quiet"}
    assert "clipping ratio" in v["clip"] and "silence ratio" in v["quiet"]


def test_sample_frames_includes_aligned_final_window(spark):
    """A full window whose start lands exactly at len-flen is sampled
    (off-by-one dropped it when len-flen was a multiple of the hop)."""
    import numpy as np

    from json_skema_spark.functions.audio import encode_wav_pcm16
    from json_skema_spark.functions.audio_features import sample_frames

    sr = 16000
    sig = np.zeros(9600, dtype=np.float64)  # 600 ms
    df = spark.createDataFrame(
        [("c1", "pcm_s16le", encode_wav_pcm16(sig, sr))],
        "clip_id string, codec string, bytes binary")
    rows = sample_frames(df, every_ms=500, frame_ms=100).collect()
    assert sorted(r.start_ms for r in rows) == [0, 500]
