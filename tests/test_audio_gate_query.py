"""Pins for the `audio_snr_verdicts` driver-gate row (round 5).

The row runs the REAL audio invariant path (functions/audio.
pcm_invariant_check: WAV parse -> cached float32 one-period reference ->
chunk-wise SNR) over deterministic per-document WAVs; the DuckDB oracle
replays encode/decode/SNR analytically. These tests pin the three verdict
classes the fixture injects so a fixture or checker regression can't slip
through as a coincidentally-matching oracle.
"""

import math

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def verdicts(spark):
    rows = entry.queries()["audio_snr_verdicts"](spark, SF).collect()
    return {r["doc_id"]: r for r in rows}


def test_one_verdict_per_document(spark, verdicts):
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(verdicts) == n_docs
    assert set(verdicts) == set(range(n_docs))


def test_truncated_payloads_fail_with_container_error(verdicts):
    corrupt = {k: v for k, v in verdicts.items() if k % 23 == 0}
    assert corrupt, "fixture must inject truncated payloads"
    for v in corrupt.values():
        assert v["invariant_ok"] is False
        assert v["error"] == "truncated_data_chunk"
        assert v["snr_db"] is None


def test_wrong_tone_decodes_but_fails_snr(verdicts):
    """One tone index off: container parses fine (empty error) but the
    decoded PCM doesn't match the clip_id's reference — SNR ~4 dB, far
    below the 30 dB verdict threshold. This is the failure class the
    north-rule invariant exists to catch."""
    off = {k: v for k, v in verdicts.items()
           if k % 17 == 0 and k % 23 != 0}
    assert off, "fixture must inject wrong-tone clips"
    for v in off.values():
        assert v["invariant_ok"] is False
        assert v["error"] == ""
        assert v["snr_db"] is not None and v["snr_db"] < 10.0


def test_clean_clips_pass_well_above_threshold(verdicts):
    clean = {k: v for k, v in verdicts.items()
             if k % 23 != 0 and k % 17 != 0}
    assert clean
    for v in clean.values():
        assert v["invariant_ok"] is True
        assert v["error"] == ""
        # PCM16 truncation noise vs float32 reference: ~86-90 dB on this
        # signal; 60 leaves headroom while staying far above the 30 dB gate
        assert v["snr_db"] >= 60.0
        assert math.isfinite(v["snr_db"])
