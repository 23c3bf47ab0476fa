"""Real-codec round-trips: stdlib WAV and hand-parsed P6 PPM.

The catalog queries audio_wav_features / image_ppm_features gate the full
encode→decode→feature path against a SQL oracle; these tests pin the codec
corners the oracle can't see (stereo, comments, malformed inputs).
"""

from __future__ import annotations

import numpy as np
import pytest

from importer_spark.operators.multimodal import (
    PPM_TYPE,
    WAV_TYPE,
    decode_media,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
)


def test_wav_roundtrip_mono():
    s = np.array([-32768, -1, 0, 1, 32767], dtype=np.int16)
    out, rate, nch = decode_wav(encode_wav(s, sample_rate=44100))
    assert rate == 44100 and nch == 1
    assert np.array_equal(out, s)


def test_wav_roundtrip_stereo():
    s = np.arange(-100, 100, dtype=np.int16)  # interleaved L/R
    out, rate, nch = decode_wav(encode_wav(s, sample_rate=8000, n_channels=2))
    assert rate == 8000 and nch == 2
    assert np.array_equal(out, s)


def test_wav_rejects_non_16bit():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit
        w.setframerate(8000)
        w.writeframes(b"\x00\x01")
    with pytest.raises(ValueError, match="16-bit"):
        decode_wav(buf.getvalue())


def test_ppm_roundtrip():
    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    out = decode_ppm(encode_ppm(px))
    assert np.array_equal(out, px)


def test_ppm_header_with_comments():
    px = np.full((2, 2, 3), 7, dtype=np.uint8)
    raw = b"P6\n# a comment\n2 # trailing\n2\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(raw), px)


def test_ppm_truncated_raster_raises():
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2 2\n255\n\x00\x00\x00")


def test_ppm_wrong_magic_raises():
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")


def test_decode_media_real_types():
    s = np.array([1, -2, 3], dtype=np.int16)
    assert decode_media(encode_wav(s), WAV_TYPE) == s.tobytes()
    px = np.zeros((1, 2, 3), dtype=np.uint8)
    assert decode_media(encode_ppm(px), PPM_TYPE) == px.tobytes()


def test_decode_media_unknown_type_still_raises():
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "image/jpeg")


def test_audio_features_query_parity(spark):
    from tests.conftest import assert_query_matches

    assert_query_matches(spark, "audio_wav_features")


def test_image_features_query_parity(spark):
    from tests.conftest import assert_query_matches

    assert_query_matches(spark, "image_ppm_features")


def test_compressed_image_codec_import_gated():
    """r5 verdict #8: JPEG/PNG decode is import-gated on Pillow (the
    tws_available pattern) — absent codec raises the documented
    NotImplementedError; with Pillow installed the same call decodes a
    real PNG to an RGB raster with no code change."""
    import pytest

    from importer_spark.operators.multimodal import (
        JPEG_TYPE,
        PNG_TYPE,
        decode_media,
        pil_available,
    )

    if not pil_available():
        for mt in (JPEG_TYPE, PNG_TYPE):
            with pytest.raises(NotImplementedError, match="Pillow"):
                decode_media(b"\x89PNG\r\n\x1a\n", mt)
        return
    # environment with Pillow: round-trip a generated 2x1 PNG
    import io as _io

    import numpy as np
    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(
        np.array([[[255, 0, 0], [0, 255, 0]]], dtype=np.uint8)
    ).save(buf, format="PNG")
    raster = decode_media(buf.getvalue(), PNG_TYPE)
    assert raster == bytes([255, 0, 0, 0, 255, 0])
