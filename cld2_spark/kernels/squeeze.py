"""CheapSqueeze: reference-exact trigger + 48-byte-chunk deletion (O8).

Reimplements (semantics, not a translation) the reference's cheap
byte-predictor squeeze machinery:

  - CountPredictedBytes (internal/compact_lang_det_impl.cc:541-581):
    a 4096-entry context-hash predictor over UTF-8 characters; bytes of
    correctly-predicted characters count as "predicted".
  - CountSpaces4 (:586-596): spaces counted in aligned 4-byte groups only.
  - CheapSqueezeTriggerTest (:952-971): on text longer than the test size,
    trigger when the FIRST 256 bytes are >=25% spaces OR >=67% predicted.
  - CheapSqueezeInplace (:785-865): delete 48-byte chunks (extended to a
    UTF-8 char boundary) that are >=25% spaces or >=40% predicted, with
    backscan/forwardscan-to-space at keep<->skip transitions (32-byte max
    scan, kMaxSpaceScan).

The character packing/stream walk is vectorized; the predictor hash chain
is inherently sequential, so it runs as a Python loop. This is fine at
scale: the squeeze only ever runs on rows longer than 2 KB whose 256-byte
prefix already looked like machine-generated junk -- a rare tail in
transcript data (the per-row cost is bounded by the row length, once).
"""

from __future__ import annotations

import numpy as np

PREDICTION_TABLE_SIZE = 4096   # kPredictionTableSize (must be 4096)
SQUEEZE_TEST_THRESH = 4096     # kCheapSqueezeTestThresh
SQUEEZE_TEST_LEN = 256         # kCheapSqueezeTestLen
SPACES_TRIGGER_PCT = 25        # kSpacesTriggerPercent
PREDICT_TRIGGER_PCT = 67       # kPredictTriggerPercent
CHUNKSIZE = 48                 # kChunksizeDefault
SPACES_THRESH_PCT = 25         # kSpacesThreshPercent
PREDICT_THRESH_PCT = 40        # kPredictThreshPercent
MAX_SPACE_SCAN = 32            # kMaxSpaceScan


def _packed_chars(buf: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized UTF-8 walk: per character (start, packed value, byte len).

    Packing matches CountPredictedBytes exactly: 1-byte chars are the byte,
    2/3/4-byte chars shift successive bytes into one int. Bytes that are
    not character starts (stray continuations) are 1-byte steps.
    """
    n = len(buf)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    b = buf.astype(np.int64)
    # inputs come from Python strings, so the buffer is always valid UTF-8
    # (the reference also handles stray continuation bytes; moot here)
    start = (b & 0xC0) != 0x80
    lead_len = np.where(b < 0xC0, 1,
                        np.where(b < 0xE0, 2, np.where(b < 0xF0, 3, 4)))
    starts = np.flatnonzero(start)
    if len(starts) == 0:
        starts = np.arange(n, dtype=np.int64)
    incr = lead_len[starts]
    # clip at the next start (malformed sequences) and the buffer end
    nxt = np.empty(len(starts), dtype=np.int64)
    nxt[:-1] = starts[1:]
    nxt[-1] = n
    incr = np.minimum(incr, nxt - starts)
    b2 = np.concatenate([b, np.zeros(3, dtype=np.int64)])
    c = b2[starts]
    for k, width in ((1, 2), (2, 3), (3, 4)):
        m = incr >= width
        if m.any():
            c = np.where(m, (c << 8) | b2[starts + k], c)
    return starts.astype(np.int64), c, incr.astype(np.int64)


def _count_spaces4(space_cum: np.ndarray, lo: int, hi: int) -> int:
    """CountSpaces4 over buf[lo:hi]: aligned groups of 4 from lo, tail
    bytes ignored (space_cum = prefix-sum of (byte == ' '))."""
    length = (hi - lo) & ~3
    return int(space_cum[lo + length] - space_cum[lo])


def _predict_run(c: np.ndarray, incr: np.ndarray, tbl: np.ndarray,
                 h: int) -> tuple[int, int]:
    """One CountPredictedBytes pass over a char slice; returns
    (predicted_byte_count, updated hash). tbl mutates in place."""
    pred = 0
    for i in range(len(c)):
        ci = int(c[i])
        if tbl[h] == ci:
            pred += int(incr[i])
        tbl[h] = ci
        h = ((h << 4) ^ ci) & 0xFFF
    return pred, h


def squeeze_trigger_test(buf: bytes, testsize: int = SQUEEZE_TEST_LEN) -> bool:
    """CheapSqueezeTriggerTest: >=25% spaces or >=67% predicted in the
    first `testsize` bytes (false on shorter text)."""
    if len(buf) < testsize:
        return False
    arr = np.frombuffer(buf, dtype=np.uint8)
    space_cum = np.zeros(len(arr) + 1, dtype=np.int64)
    np.cumsum(arr == 0x20, out=space_cum[1:])
    if _count_spaces4(space_cum, 0, testsize) >= testsize * SPACES_TRIGGER_PCT // 100:
        return True
    starts, c, incr = _packed_chars(arr)
    sel = starts < testsize          # chars starting inside the test window
    tbl = np.zeros(PREDICTION_TABLE_SIZE, dtype=np.int64)
    pred, _ = _predict_run(c[sel], incr[sel], tbl, 0)
    return pred >= testsize * PREDICT_TRIGGER_PCT // 100


def cheap_squeeze(text: str, chunksize: int = CHUNKSIZE) -> str:
    """CheapSqueezeInplace: delete mostly-space / mostly-predicted 48-byte
    chunks, splicing at word boundaries. Input is expected to be a
    letters+single-spaces stream (the scriptspan form the reference
    squeezes); returns the squeezed string."""
    buf = text.encode("utf-8")
    n = len(buf)
    arr = np.frombuffer(buf, dtype=np.uint8)
    space_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(arr == 0x20, out=space_cum[1:])
    starts, c, incr = _packed_chars(arr)
    tbl = np.zeros(PREDICTION_TABLE_SIZE, dtype=np.int64)
    h = 0
    space_thresh = chunksize * SPACES_THRESH_PCT // 100
    predict_thresh = chunksize * PREDICT_THRESH_PCT // 100

    kept: list[bytes] = []
    kept_len = 0
    skipping = False
    src = 0
    ci = 0  # char cursor
    while src < n:
        ln = min(chunksize, n - src)
        while src + ln < n and (buf[src + ln] & 0xC0) == 0x80:
            ln += 1
        cj = ci
        while cj < len(starts) and starts[cj] < src + ln:
            cj += 1
        pred, h = _predict_run(c[ci:cj], incr[ci:cj], tbl, h)
        space_n = _count_spaces4(space_cum, src, src + ln)
        if space_n >= space_thresh or pred >= predict_thresh:
            if not skipping:
                # keep->skip transition: backscan the kept OUTPUT to a
                # space (BackscanToSpace scans the contiguous dst buffer,
                # up to kMaxSpaceScan bytes -- so the scan may cross kept
                # chunk boundaries)
                window = min(MAX_SPACE_SCAN, kept_len)
                tail = b"".join(kept)[-window:] if window else b""
                k = tail.rfind(b" ")
                if k >= 0:
                    drop = len(tail) - (k + 1)
                    while drop and kept:
                        last = kept[-1]
                        if len(last) <= drop:
                            drop -= len(last)
                            kept_len -= len(last)
                            kept.pop()
                        else:
                            kept[-1] = last[:len(last) - drop]
                            kept_len -= drop
                            drop = 0
                if kept_len == 0:
                    kept = [b" "]  # force a leading space (reference :820)
                    kept_len = 1
                skipping = True
        else:
            chunk = buf[src:src + ln]
            if skipping:
                # skip->keep transition: forwardscan to a space
                k = chunk.find(b" ", 0, MAX_SPACE_SCAN)
                chunk = chunk[k + 1:] if k >= 0 else chunk
                skipping = False
            if chunk:
                kept.append(chunk)
                kept_len += len(chunk)
        src += ln
        ci = cj
    return b"".join(kept).decode("utf-8", errors="ignore")
