"""Import-guarded REAL codec registration (VERDICT r03 next #5): flac/opus
via soundfile, jpeg/png/webp via Pillow — registered only when the library
is importable, deterministic rejection otherwise. The real-path tests are
skip-marked in environments without the libs (this sandbox); the graceful-
absence path always runs."""

import importlib.util

import pytest

from json_skema_spark.functions import audio as audio_fn
from json_skema_spark.functions import media as media_fn

_HAS_SF = importlib.util.find_spec("soundfile") is not None
_HAS_PIL = importlib.util.find_spec("PIL") is not None


def test_optional_audio_decoders_absent_is_graceful():
    if _HAS_SF:
        pytest.skip("soundfile present: absence path not reachable")
    assert audio_fn.register_optional_decoders() == []
    # flac still deterministically rejects, never crashes
    sig, sr, err = audio_fn._decode_dispatch("flac", b"fLaC....")
    assert sig is None and err == "codec_not_supported:flac"


def test_optional_image_decoders_absent_is_graceful():
    if _HAS_PIL:
        pytest.skip("Pillow present: absence path not reachable")
    assert media_fn.register_optional_image_decoders() == []


@pytest.mark.skipif(not _HAS_SF, reason="soundfile not installed")
def test_real_flac_decoder_roundtrip(spark):
    """With soundfile present: encode a synthetic tone as FLAC, run it
    through the SAME pcm_invariant_check path as WAV rows."""
    import io

    import numpy as np
    import soundfile as sf

    try:
        codecs = audio_fn.register_optional_decoders()
        assert "flac" in codecs
        sr = 16000
        sig = audio_fn.synth_signal(0, sr_hz=sr, dur_ms=200) \
            if hasattr(audio_fn, "synth_signal") else \
            np.sin(2 * np.pi * 440.0 * np.arange(sr // 5) / sr) * 0.5
        buf = io.BytesIO()
        sf.write(buf, sig, sr, format="FLAC")
        flac_bytes = buf.getvalue()
        out, got_sr, err = audio_fn._decode_dispatch("flac", flac_bytes)
        assert err == "" and got_sr == sr
        assert np.allclose(out, sig, atol=1e-3)

        df = spark.createDataFrame(
            [("c1", bytearray(flac_bytes), sr, 200, "flac", "t")],
            "clip_id string, bytes binary, sr_hz int, dur_ms int, "
            "codec string, transcript string")
        checked = audio_fn.pcm_invariant_check(df, None).collect()
        assert checked[0].decode_ok
    finally:
        audio_fn.unregister_decoder("flac")
        audio_fn.unregister_decoder("opus")


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_real_png_decoder_roundtrip():
    import io

    import numpy as np
    from PIL import Image

    try:
        codecs = media_fn.register_optional_image_decoders()
        assert "png" in codecs
        arr = (np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3))
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        out, err = media_fn._IMAGE_DECODERS["png"](buf.getvalue())
        assert err == "" and np.array_equal(out, arr)
    finally:
        for c in ("jpeg", "png", "webp"):
            media_fn.unregister_image_decoder(c)


def test_decoder_snapshot_carries_known_set():
    """Review r04: the UDF closure snapshot must include the KNOWN-codec
    set — an executor's re-imported module only has the builtins, so a
    driver-registered codec would report unknown_codec there while the
    driver says codec_not_supported."""
    def fake(buf):
        return None, 0, "nope"

    audio_fn.register_decoder("mp3", fake)
    try:
        # the register/unregister-fake pattern: mp3 is KNOWN (register
        # adds it permanently) but currently has no decoder
        audio_fn.unregister_decoder("mp3")
        snap = audio_fn._decoder_snapshot()
        # simulate the executor: dispatch with the snapshot only — the
        # known set must ride the snapshot, not the module global
        _sig, _sr, err = audio_fn._decode_with(snap, "mp3", b"x")
        assert err == "codec_not_supported:mp3"
        # genuinely unknown codec still says so
        _sig, _sr, err2 = audio_fn._decode_with(snap, "xyz", b"x")
        assert err2 == "unknown_codec:xyz"
    finally:
        audio_fn.unregister_decoder("mp3")
        audio_fn._KNOWN_CODECS.discard("mp3")

    media_fn.register_image_decoder("tiff", lambda b: (None, "nope"))
    try:
        media_fn.unregister_image_decoder("tiff")
        msnap = media_fn._image_decoder_snapshot()
        _img, err = media_fn._decode_image(msnap, "tiff", b"x")
        assert err == "codec_not_supported:tiff"
    finally:
        media_fn.unregister_image_decoder("tiff")
        media_fn._KNOWN_IMAGE_CODECS.discard("tiff")


def test_audio_violations_forwards_invariant_kwargs(spark):
    """Review r04: the production violations path must be able to enable
    the opt-in duration gate."""
    import numpy as np
    sr, dur_ms = 16000, 1000
    # synthesize a clip whose payload holds only HALF the claimed duration
    n = sr * dur_ms // 1000 // 2
    sig = np.sin(2 * np.pi * 440.0 * np.arange(n) / sr) * 0.5
    from json_skema_spark.functions.audio import encode_wav_pcm16
    wav = encode_wav_pcm16(sig, sr)
    df = spark.createDataFrame(
        [("clip_truncated00", bytearray(wav), sr, dur_ms, "pcm_s16le", "t")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string")
    # duration gate off: row's SNR is computed against the claimed
    # duration's reference -> decode_ok False anyway OR True; the point is
    # the gate FLAG must flow through, so compare both modes' error text
    viols_gated = audio_fn.audio_violations(df, check_duration=True)
    msgs = [r.message for r in viols_gated.collect()]
    assert msgs, "expected a violation for the truncated clip"
