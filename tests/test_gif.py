"""GIF LZW codec: round trips, decoder generality, fuzz robustness."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from cld2_spark.operators.gif import (GIF_MAX_CODE, decode_gif_pixels,
                                      encode_gif_fixture, gif_fixture_dims,
                                      gif_fixture_indices, gif_palette,
                                      lzw_decode, lzw_encode)


def test_lzw_roundtrip_including_4096_reset():
    rng = np.random.RandomState(0)
    for n in (1, 2, 17, 1000):
        d = bytes(rng.randint(0, 16, n, dtype=np.uint8))
        assert lzw_decode(lzw_encode(d, 4), 4) == d
    # long low-entropy stream: many width growths + the table-cap reset
    d = bytes(rng.randint(0, 4, 120_000, dtype=np.uint8))
    assert lzw_decode(lzw_encode(d, 2), 2) == d


def test_fixture_roundtrip_all_variants():
    pal = gif_palette()
    for seed in range(15):        # covers interlace x GCE x all dims
        px = decode_gif_pixels(encode_gif_fixture(seed))
        assert px is not None
        w, h = gif_fixture_dims(seed)
        assert px.shape == (h, w, 3)
        assert (px == pal[gif_fixture_indices(seed)]).all(), seed


def _uncompressed_gif(idx: np.ndarray) -> bytes:
    """An 'uncompressed GIF' writer (the classic literal-codes-only
    trick used by minimal encoders): every pixel is emitted as its own
    literal code, with a CLEAR before the decoder's next_code would
    outgrow the fixed width. A conformant decoder must accept it —
    this pins decoder GENERALITY beyond our own encoder's output."""
    h, w = idx.shape
    mcs = 4
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    budget = (1 << width) - eoi - 2     # literals before width would grow
    for i, v in enumerate(idx.reshape(-1).tolist()):
        if i and i % budget == 0:
            emit(clear)
        emit(v)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    buf = bytearray(b"GIF89a")
    buf += struct.pack("<HHBBB", w, h, 0x80 | 0x03, 0, 0)
    buf += gif_palette().tobytes()
    buf += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    buf.append(mcs)
    for i in range(0, len(out), 255):
        chunk = out[i:i + 255]
        buf.append(len(chunk))
        buf += chunk
    buf.append(0)
    buf += b"\x3b"
    return bytes(buf)


def test_decoder_accepts_foreign_uncompressed_writer():
    idx = gif_fixture_indices(7)
    px = decode_gif_pixels(_uncompressed_gif(idx))
    assert px is not None
    assert (px == gif_palette()[idx]).all()


def test_local_color_table_overrides_global():
    idx = np.zeros((2, 2), dtype=np.uint8)
    buf = bytearray(b"GIF89a")
    buf += struct.pack("<HHBBB", 2, 2, 0x80 | 0x00, 0, 0)   # 2-entry GCT
    buf += bytes([0, 0, 0, 255, 255, 255])
    buf += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0x80 | 0x00)
    buf += bytes([9, 8, 7, 1, 2, 3])                        # 2-entry LCT
    payload = lzw_encode(idx.tobytes(), 2)
    buf.append(2)
    buf.append(len(payload))
    buf += payload
    buf.append(0)
    buf += b"\x3b"
    px = decode_gif_pixels(bytes(buf))
    assert px is not None and (px == [9, 8, 7]).all()


@given(st.binary(max_size=400))
@settings(max_examples=150, deadline=None)
def test_decode_never_crashes_on_garbage(buf):
    decode_gif_pixels(buf)
    decode_gif_pixels(b"GIF89a" + buf)


@given(st.integers(0, 10_000), st.integers(0, 120))
@settings(max_examples=60, deadline=None)
def test_mutated_real_gif_never_crashes(seed, flip):
    buf = bytearray(encode_gif_fixture(seed % 40))
    buf[flip % len(buf)] ^= 0xFF
    out = decode_gif_pixels(bytes(buf))
    assert out is None or (isinstance(out, np.ndarray)
                           and out.dtype == np.uint8 and out.ndim == 3)
