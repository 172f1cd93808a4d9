"""Pure-numpy codec tests (functions/codecs.py).

The decoders are pinned to HAND-WRITTEN golden byte strings built field
by field from the public specs (so an encoder/decoder bug pair cannot
cancel out in round-trip tests), plus encode→decode round-trips over
shapes that exercise row padding, and Spark-level tests of the
image_stats / audio_stats operators over planted payloads.
"""

import struct

import numpy as np
import pytest

from cdc_data_lake_pyspark_spark.functions.codecs import (
    decode_any_image,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
)


def _golden_bmp_2x2() -> bytes:
    """2x2 24-bit BMP written by hand: red green / blue white (row-major
    RGB), stored bottom-up in BGR with rows padded 6 → 8 bytes."""
    pixel_array = bytes(
        [255, 0, 0]  # bottom-left: blue as BGR
        + [255, 255, 255]  # bottom-right: white
        + [0, 0]  # row pad to 8
        + [0, 0, 255]  # top-left: red as BGR
        + [0, 255, 0]  # top-right: green as BGR
        + [0, 0]
    )
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_array), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixel_array), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixel_array


GOLDEN_RGB_2X2 = np.array(
    [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
)


def test_decode_bmp_golden():
    assert (decode_bmp(_golden_bmp_2x2()) == GOLDEN_RGB_2X2).all()


def test_decode_bmp_top_down():
    # negative height flips storage to top-down: first stored row is the
    # TOP row; same pixels as the golden image
    pixel_array = bytes(
        [0, 0, 255, 0, 255, 0, 0, 0]  # top row (BGR) + pad
        + [255, 0, 0, 255, 255, 255, 0, 0]  # bottom row + pad
    )
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_array), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(pixel_array), 2835, 2835, 0, 0
    )
    assert (decode_bmp(file_header + info_header + pixel_array) == GOLDEN_RGB_2X2).all()


def test_encode_bmp_emits_golden_bytes():
    assert encode_bmp(GOLDEN_RGB_2X2) == _golden_bmp_2x2()


def test_bmp_rejects_unsupported():
    bad = bytearray(_golden_bmp_2x2())
    struct.pack_into("<H", bad, 28, 8)  # bpp=8
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))
    with pytest.raises(ValueError):
        decode_bmp(b"JUNK" * 20)


def test_decode_ppm_golden_with_comment():
    payload = b"P6\n# a comment\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    expected = np.array([[[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)
    assert (decode_ppm(payload) == expected).all()
    assert (decode_any_image(payload) == expected).all()


def test_decode_wav_golden():
    samples = [1, -2, 3]
    data = struct.pack("<3h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = decode_wav(payload)
    assert rate == 8000
    assert out.tolist() == samples


def test_decode_wav_skips_extra_chunks():
    samples = [100, -100]
    data = struct.pack("<2h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt + extra
    body += b"data" + struct.pack("<I", len(data)) + data
    out, rate = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate == 44100
    assert out.tolist() == samples


@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (3, 2), (5, 7), (4, 4)])
def test_bmp_ppm_roundtrip(shape):
    # widths 3, 7 exercise the 4-byte row padding path
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(px)) == px).all()
    assert (decode_ppm(encode_ppm(px)) == px).all()


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip(channels):
    rng = np.random.default_rng(7)
    shape = (33,) if channels == 1 else (33, channels)
    s = rng.integers(-32768, 32768, size=shape, dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, sample_rate=22050))
    assert rate == 22050
    assert (out == s).all()


def test_image_audio_stats_spark(spark):
    from cdc_data_lake_pyspark_spark.operators.multimodal import (
        audio_stats,
        image_stats,
        synth_audio_samples,
        synth_image_pixels,
        synth_media_payloads,
    )

    ids = spark.range(0, 12).withColumnRenamed("id", "doc_id").repartition(3)
    payloads = synth_media_payloads(ids)
    img = {r.doc_id: r for r in image_stats(payloads, payload_col="bmp_payload").collect()}
    aud = {r.doc_id: r for r in audio_stats(payloads, payload_col="wav_payload").collect()}
    for did in range(12):
        px = synth_image_pixels(did).astype(np.int64)
        flat = px.reshape(-1)
        assert img[did].width == px.shape[1]
        assert img[did].height == px.shape[0]
        assert img[did].r_sum == px[:, :, 0].sum()
        assert img[did].b_sum == px[:, :, 2].sum()
        assert img[did].weighted_sum == (flat * np.arange(1, flat.size + 1)).sum()
        s, rate = synth_audio_samples(did)
        s = s.astype(np.int64)
        assert aud[did].n_samples == s.size
        assert aud[did].sample_rate == rate
        assert aud[did].sample_sum == s.sum()
        assert aud[did].weighted_sum == (s * np.arange(1, s.size + 1)).sum()


def test_audio_frame_features_known_energy_and_crossings(spark):
    from pyspark.sql import Row

    from cdc_data_lake_pyspark_spark.operators.multimodal import (
        audio_frame_features,
    )

    # frame 0: alternating +100/-100 -> 3 crossings, energy 4*100^2
    # frame 1: constant 50 -> 0 crossings; tail of 2 samples dropped
    s = np.array([100, -100, 100, -100, 50, 50, 50, 50, 7, 7], dtype=np.int16)
    wav = encode_wav(s, sample_rate=8000)
    df = spark.createDataFrame([Row(doc_id=1, payload=bytearray(wav))])
    out = sorted(
        audio_frame_features(df, payload_col="payload", frame_len=4).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.frame_idx, r.energy_sum, r.zero_crossings) for r in out] == [
        (0, 4 * 100 * 100, 3),
        (1, 4 * 50 * 50, 0),
    ]


def test_image_tile_stats_edge_tiles_keep_partial_counts(spark):
    from pyspark.sql import Row

    from cdc_data_lake_pyspark_spark.operators.multimodal import (
        image_tile_stats,
    )

    # 3x3 image, value = row*10 + col in every channel: 2x2 tiling gives
    # a full tile, two 2-pixel edge tiles, and a 1-pixel corner
    px = np.zeros((3, 3, 3), dtype=np.uint8)
    for r in range(3):
        for c in range(3):
            px[r, c, :] = r * 10 + c
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(encode_bmp(px)))]
    )
    out = {
        (r.tile_row, r.tile_col): (r.n_px, r.tile_sum)
        for r in image_tile_stats(df, payload_col="payload", tile=2).collect()
        if r.channel == 0
    }
    assert out == {
        (0, 0): (4, 0 + 1 + 10 + 11),
        (0, 1): (2, 2 + 12),
        (1, 0): (2, 20 + 21),
        (1, 1): (1, 22),
    }
