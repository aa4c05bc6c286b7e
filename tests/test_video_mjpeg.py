"""MJPEG-in-MP4 video decode: sample-table resolution (stsz/stsc/stco),
per-frame JPEG entropy decode, integer-exact feature reduction, and the
Spark operator end to end. Also pins the round-6 decode_jpeg_gray fix:
Huffman/quant TABLE SELECTORS are read from SOS/SOF, not assumed 0."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cld2_spark.operators.jpeg import (decode_jpeg_gray, encode_jpeg_gray,
                                       gray_fixture_pixels)
from cld2_spark.operators.multimodal import (encode_mjpeg_mp4_fixture,
                                             encode_mp4_fixture,
                                             mjpeg_video_features,
                                             mp4_sample_table,
                                             parse_mp4_meta,
                                             video_frame_pixels)


def test_sample_table_resolves_two_chunk_layout():
    # odd frame count -> two stsc runs with different samples-per-chunk
    buf = encode_mjpeg_mp4_fixture(7, 3)
    st = mp4_sample_table(buf)
    assert st is not None and len(st) == 3
    # offsets strictly increasing, sizes positive, all inside the file
    for (o1, s1), (o2, _) in zip(st, st[1:]):
        assert o1 + s1 == o2 or o2 > o1  # contiguous within chunk
    assert all(s > 0 and o + s <= len(buf) for o, s in st)
    # each slice is a standalone JPEG (SOI..EOI)
    for o, s in st:
        assert buf[o:o + 2] == b"\xff\xd8"
        assert decode_jpeg_gray(buf[o:o + s]) is not None


@pytest.mark.parametrize("mid,nf", [(0, 2), (1, 3), (2, 4), (11, 2)])
def test_features_match_direct_frame_decode(mid, nf):
    buf = encode_mjpeg_mp4_fixture(mid, nf)
    feat = mjpeg_video_features(buf)
    frames = [decode_jpeg_gray(
        encode_jpeg_gray(video_frame_pixels(mid, fi))).astype(np.int64)
        for fi in range(nf)]
    v = np.stack(frames)
    motion = sum(int(np.abs(frames[i] - frames[i - 1]).sum())
                 for i in range(1, nf))
    assert feat == (nf, v.shape[2], v.shape[1], int(v.sum()),
                    int((v * v).sum()), int(v.min()), int(v.max()), motion)
    assert motion > 0  # phase-shifted frames -> real inter-frame motion


def test_meta_and_frames_agree():
    buf = encode_mjpeg_mp4_fixture(5, 4)
    w, h, dur = parse_mp4_meta(buf)
    nf, fw, fh = mjpeg_video_features(buf)[:3]
    assert (w, h) == (fw, fh)
    assert dur == nf * 100  # 10 fps at timescale 1000


def test_unresolvable_containers_return_none():
    assert mp4_sample_table(encode_mp4_fixture(64, 48, 2000)) is None
    assert mjpeg_video_features(b"") is None
    assert mjpeg_video_features(b"\x00" * 64) is None
    buf = encode_mjpeg_mp4_fixture(3, 3)
    # truncating mdat makes a frame slice run past the buffer -> None
    assert mjpeg_video_features(buf[:len(buf) // 2]) is None


# ---- round-6 ADVICE fix: SOS/SOF table selectors in decode_jpeg_gray ----

def _remap_tables_to_id1(buf: bytes) -> bytes:
    """Rewrite a single-component baseline JPEG so DQT/DHT define table
    id 1 (instead of 0) and SOF/SOS select it — byte surgery only; the
    entropy stream is untouched, so a selector-aware decoder must produce
    the identical image."""
    out = bytearray(buf)
    i = 2
    while i + 4 <= len(out):
        marker = (out[i] << 8) | out[i + 1]
        (ln,) = struct.unpack_from(">H", out, i + 2)
        p = i + 4
        if marker == 0xFFDB:       # DQT: Pq<<4|Tq
            out[p] = (out[p] & 0xF0) | 0x01
        elif marker == 0xFFC0:     # SOF0 single component: Tq at p+8
            out[p + 8] = 0x01
        elif marker == 0xFFC4:     # DHT: class<<4|id
            out[p] = (out[p] & 0xF0) | 0x01
        elif marker == 0xFFDA:     # SOS: Td<<4|Ta at p+2
            out[p + 2] = 0x11
            break
        i += 2 + ln
    return bytes(out)


def test_gray_decoder_honors_table_selectors():
    px = gray_fixture_pixels(9)
    buf = encode_jpeg_gray(px)
    remapped = _remap_tables_to_id1(buf)
    assert remapped != buf
    a = decode_jpeg_gray(buf)
    b = decode_jpeg_gray(remapped)
    assert b is not None, "selector-remapped stream must still decode"
    assert np.array_equal(a, b)


def test_gray_decoder_rejects_missing_selected_table():
    # SOS selects table 1 but DHT/DQT still define id 0 -> None, not a
    # silent misdecode with the wrong tables
    buf = bytearray(encode_jpeg_gray(gray_fixture_pixels(4)))
    i = 2
    while i + 4 <= len(buf):
        marker = (buf[i] << 8) | buf[i + 1]
        (ln,) = struct.unpack_from(">H", buf, i + 2)
        if marker == 0xFFDA:
            buf[i + 4 + 2] = 0x11
            break
        i += 2 + ln
    assert decode_jpeg_gray(bytes(buf)) is None


def test_video_frame_features_spark(spark):
    import pandas as pd

    from cld2_spark.operators.multimodal import video_frame_features

    ids = list(range(8))
    pdf = pd.DataFrame({
        "media_id": ids,
        "payload": [encode_mjpeg_mp4_fixture(i, 2 + i % 3) for i in ids]})
    # one junk row: must be dropped, not crash
    pdf.loc[len(pdf)] = [99, b"not an mp4"]
    df = spark.createDataFrame(pdf)
    got = {r["media_id"]: r for r in video_frame_features(df).collect()}
    assert set(got) == set(ids)
    for i in ids:
        exp = mjpeg_video_features(encode_mjpeg_mp4_fixture(i, 2 + i % 3))
        r = got[i]
        assert (r["n_frames"], r["width"], r["height"], r["px_sum"],
                r["px_sumsq"], r["px_min"], r["px_max"],
                r["motion"]) == exp
