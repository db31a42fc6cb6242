"""Multimodal codec tests: the encoders emit valid files, the decoder
parses real header bytes, and the Spark path round-trips end to end."""

from __future__ import annotations

import struct
import zlib

import pytest

from dateng_data_lakes_apache_spark_spark.functions.multimodal import (
    _dims_for,
    attach_image_payload,
    bmp_bytes,
    decode_image,
    count_gif_frames,
    decode_wav,
    extract_features,
    gif_anim_bytes,
    gif_bytes,
    wav_bytes,
    png_bytes,
)


@pytest.mark.parametrize("w,h", [(16, 16), (17, 23), (63, 1), (1, 63)])
def test_codec_round_trip_all_formats(w, h):
    assert decode_image(png_bytes(w, h)) == ("png", w, h)
    assert decode_image(gif_bytes(w, h)) == ("gif", w, h)
    assert decode_image(bmp_bytes(w, h)) == ("bmp", w, h)


def test_png_is_internally_valid():
    # Parse the chunk stream for real: IHDR fields, IDAT inflates to
    # exactly h filter-prefixed scanlines, CRCs all check out.
    data = png_bytes(20, 11)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    i, idat = 8, b""
    seen = []
    while i < len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + length]
        (crc,) = struct.unpack(">I", data[i + 8 + length : i + 12 + length])
        assert crc == zlib.crc32(tag + body) & 0xFFFFFFFF
        seen.append(tag)
        if tag == b"IDAT":
            idat += body
        i += 12 + length
    assert seen == [b"IHDR", b"IDAT", b"IEND"]
    assert zlib.decompress(idat) == (b"\x00" + bytes(20)) * 11


def test_bmp_layout_and_negative_height():
    data = bmp_bytes(10, 4)
    assert data[:2] == b"BM"
    (size,) = struct.unpack("<I", data[2:6])
    assert size == len(data)
    # top-down BMPs store negative height; decoder must return abs value
    flipped = data[:22] + struct.pack("<i", -4) + data[26:]
    assert decode_image(flipped) == ("bmp", 10, 4)


def test_gif_structure():
    data = gif_bytes(7, 5)
    assert data[:6] == b"GIF89a"
    assert data[-1:] == b"\x3B"  # trailer
    assert struct.unpack("<HH", data[6:10]) == (7, 5)


def test_jpeg_sof_scan():
    # SOI + APP0 stub + SOF0 (height=33, width=77) — the decoder must walk
    # past APP0 and read the frame header, not assume a fixed offset.
    app0 = b"\xff\xe0" + struct.pack(">H", 6) + b"JF\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 33, 77) + b"\x01\x00"
    assert decode_image(b"\xff\xd8" + app0 + sof0) == ("jpeg", 77, 33)


def test_decoder_strictness():
    with pytest.raises(ValueError):
        decode_image(None)
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n1234")  # truncated
    with pytest.raises(ValueError):
        decode_image(b"not an image format here")


def test_spark_stage_and_decode_round_trip(spark):
    docs = spark.createDataFrame([(i,) for i in range(9)], ["doc_id"])
    feats = extract_features(attach_image_payload(docs)).collect()
    assert len(feats) == 9
    for r in feats:
        w, h = _dims_for(r.doc_id)
        assert (r.width, r.height) == (w, h)
        assert r.fmt == {0: "png", 1: "gif", 2: "bmp"}[r.doc_id % 3]
        assert r.payload_len > 0


def test_gif_anim_roundtrip():
    # encoder and block-walking parser agree for every staged frame count
    for n in range(1, 8):
        b = gif_anim_bytes(8, 8, n)
        assert count_gif_frames(b) == n
        assert decode_image(b) == ("gif", 8, 8)
    assert count_gif_frames(gif_bytes(16, 16)) == 1


def test_gif_frame_parser_rejects_garbage():
    with pytest.raises(ValueError):
        count_gif_frames(b"NOTAGIF" + bytes(64))
    with pytest.raises(ValueError):
        count_gif_frames(gif_anim_bytes(8, 8, 2)[:-1])  # trailer cut off


def test_wav_roundtrip_and_strictness():
    for rate in (8000, 44100):
        for ch in (1, 2):
            assert decode_wav(wav_bytes(rate, 4899, ch)) == (rate, ch, 4899)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE" + bytes(40))
    with pytest.raises(ValueError):
        decode_wav(wav_bytes(8000, 100)[:20])  # fmt chunk truncated away


def test_classify_payload_per_container_contract():
    """r11 corrupt-bytes contract (VERDICT r10 item 4): every container's
    corrupt shape classifies — never throws — and valid bytes still
    classify ok through the same strict decoders."""
    from dateng_data_lakes_apache_spark_spark.functions.multimodal import (
        classify_payload,
        mp4_bytes,
        webp_bytes,
    )

    # valid payloads → ok, per container
    assert classify_payload(png_bytes(16, 16)) == ("png", "ok")
    assert classify_payload(gif_bytes(16, 16)) == ("gif", "ok")
    assert classify_payload(bmp_bytes(16, 16)) == ("bmp", "ok")
    assert classify_payload(wav_bytes(8000, 100)) == ("wav", "ok")
    assert classify_payload(mp4_bytes(600, 1800, 64, 48)) == ("mp4", "ok")
    assert classify_payload(webp_bytes(32, 16)) == ("webp", "ok")
    # truncated-mid-header: container recognized from the magic, decoder
    # rejection becomes a status instead of an exception
    assert classify_payload(png_bytes(16, 16)[:20]) == ("png", "truncated")
    assert classify_payload(gif_bytes(16, 16)[:8]) == ("gif", "truncated")
    assert classify_payload(wav_bytes(8000, 100)[:16]) == ("wav", "truncated")
    assert classify_payload(mp4_bytes(600, 1800, 64, 48)[:10]) == (
        "mp4",
        "truncated",
    )
    # wrong magic / empty / null
    assert classify_payload(b"XXJUNKXX" * 4) == ("unknown", "bad_magic")
    assert classify_payload(b"") == ("unknown", "empty")
    assert classify_payload(None) == ("unknown", "null")


def test_corrupt_audit_counts_planted_classes(spark):
    """The registered audit must count every planted class on the real
    catalog: 11-way doc_id rule → exactly the predicted per-class rows."""
    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    from .conftest import SF_SMALL

    rows = {
        (r.container, r.status): r.n_payloads
        for r in get_queries()["q_multimodal_corrupt_audit"](
            spark, SF_SMALL
        ).collect()
    }
    assert rows[("png", "ok")] > 0 and rows[("png", "truncated")] > 0
    assert rows[("wav", "ok")] > 0 and rows[("wav", "truncated")] > 0
    assert rows[("mp4", "ok")] > 0 and rows[("mp4", "truncated")] > 0
    assert rows[("unknown", "bad_magic")] > 0
    assert rows[("unknown", "empty")] > 0
    assert rows[("unknown", "null")] > 0
    assert sum(rows.values()) == 500  # every sf0.001 document classified
