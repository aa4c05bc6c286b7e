"""Vectorized batch text normalization for the langid kernels.

Replaces CLD2's ScriptScanner byte-level scan loop
(GetOneScriptSpan, reference internal/getonescriptspan.cc:799-1027) with
whole-batch NumPy array ops: the batch's texts are joined once, decoded to a
flat uint32 codepoint array, classified per char (script / letter /
lowercase) via the lookup tables in unicode_tables.py, and carried around as
struct-of-arrays -- the same SoA decomposition CLD2 uses for its hit buffers
(internal/scoreonescriptspan.h:196-203), lifted to batch granularity.

Spans are never materialized as objects: every downstream operator works on
(codepoint, row_id, script, letter) parallel arrays.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import unicode_tables as ut

SPACE = np.uint32(32)
REPLACEMENT_CHAR = 0xFFFD
TEXT_LIMIT = 160 * 1024  # chars scored per row (CLD2 text limit, K4)


@dataclass
class NormBatch:
    """Struct-of-arrays view of one batch of texts."""

    n: int                # number of rows
    cp: np.ndarray        # uint32 codepoints (joined; 1 leading + 1 trailing space per row)
    rid: np.ndarray       # int32 row id per codepoint
    u8len: np.ndarray     # int8 UTF-8 byte length per codepoint
    script: np.ndarray    # uint8 script id per codepoint
    letter: np.ndarray    # bool is-letter per codepoint
    lower: np.ndarray     # uint32 lowercased codepoint
    text_bytes: np.ndarray  # int64 UTF-8 byte length per row (original text)
    has_replacement: np.ndarray  # bool per row: contains U+FFFD (bad UTF-8 marker)


def normalize_batch(texts: list[str]) -> NormBatch:
    """Join a batch, decode to codepoints, classify each char.

    Each text is wrapped in single spaces so words never span rows and the
    quad hasher's pre/post-space sensing (internal/cldutil_shared.cc:192-202)
    works at text edges without branches.
    """
    n = len(texts)
    script_t, letter_t, lower_t = ut.tables()
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return NormBatch(n=0, cp=z.astype(np.uint32), rid=z.astype(np.int32),
                         u8len=z.astype(np.int8), script=z.astype(np.uint8),
                         letter=z.astype(bool), lower=z.astype(np.uint32),
                         text_bytes=z, has_replacement=z.astype(bool))
    # CLD2 scans at most ~160KB of text per document (FLAGS_cld_textlimit,
    # internal/compact_lang_det_impl.cc:192,1811-1812); the cap also bounds
    # every per-row accumulator to int32 range
    if any(len(t) > TEXT_LIMIT for t in texts):
        texts = [t if len(t) <= TEXT_LIMIT else t[:TEXT_LIMIT] for t in texts]
    joined = " " + " ".join(texts) + " "
    cp = ut.codepoints_of(joined)

    lens = np.fromiter((len(t) for t in texts), count=n, dtype=np.int64)
    # layout: ' ' t0 ' ' t1 ' ' ... tn-1 ' '  -> leading space owned by
    # row 0, so row 0's repeat count is lens[0] + 2 (one allocation, no
    # concatenate copy)
    counts = lens + 1
    counts[0] += 1
    rid = np.repeat(np.arange(n, dtype=np.int32), counts)

    cp_c = np.minimum(cp, ut.MAX_CP - 1)
    script = script_t[cp_c]
    letter = letter_t[cp_c] & (cp < ut.MAX_CP)
    # in-place masked fill instead of where(...).astype: one gather, no
    # temporary float/int copies
    lower = lower_t[cp_c]
    lower[~letter] = SPACE

    # per-row UTF-8 byte counts of the original text. Multi-byte chars are
    # the sparse case in transcript corpora, so count them through small
    # index arrays instead of a float-weighted bincount over every char
    # (bincount weights go through float64; this stays integer end-to-end)
    u8len = (1 + (cp > 0x7F).astype(np.int8) + (cp > 0x7FF) + (cp > 0xFFFF)).astype(np.int8)
    tb = lens.copy()  # wrapper spaces excluded by construction
    for thresh in (0x7F, 0x7FF, 0xFFFF):
        extra = np.flatnonzero(cp > thresh)
        if len(extra) == 0:
            break
        tb += np.bincount(rid[extra], minlength=n).astype(np.int64)

    bad = cp == REPLACEMENT_CHAR
    repl = (np.bincount(rid[bad], minlength=n) > 0) if bad.any() \
        else np.zeros(n, dtype=bool)

    return NormBatch(n=n, cp=cp, rid=rid, u8len=u8len, script=script,
                     letter=letter, lower=lower, text_bytes=tb,
                     has_replacement=repl)


def group_stream_with_script(nb: NormBatch, script_ids: np.ndarray):
    """Like group_stream but also returns the per-kept-char script ids and
    the kept chars' ORIGINAL positions in nb.cp (the OffsetMap analogue,
    internal/offsetmap.h:25-45 -- lets chunk spans map back to the source
    text), so a single pass can serve several script groups."""
    if len(nb.cp) == 0:
        e = np.zeros(0, dtype=np.uint32)
        return e, nb.rid, nb.script, e.astype(np.int64)
    lut = np.zeros(ut.N_SCRIPTS, dtype=bool)
    lut[script_ids] = True
    in_group = nb.letter & lut[nb.script]
    arr = np.where(in_group, nb.lower, SPACE)
    is_sp = arr == SPACE
    prev_sp = np.empty_like(is_sp)
    prev_sp[0] = False
    prev_sp[1:] = is_sp[:-1]
    keep = ~(is_sp & prev_sp)
    keep[0] = True
    orig = np.flatnonzero(keep).astype(np.int64)
    return arr[keep], nb.rid[keep], nb.script[keep], orig


def group_stream(nb: NormBatch, script_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Compress the batch to one group's letters + single-space separators.

    Equivalent to CLD2's per-scriptspan letter stream ("collapse non-letters
    to single space", internal/getonescriptspan.cc:799-1027) but computed for
    a whole batch in one pass. Returns (codepoints, row_ids); the stream
    always starts with a space and every row boundary is a space, so grams
    never cross rows.
    """
    if len(nb.cp) == 0:
        return np.zeros(0, dtype=np.uint32), nb.rid
    if len(script_ids) == 1:
        in_group = nb.letter & (nb.script == script_ids[0])
    else:
        lut = np.zeros(ut.N_SCRIPTS, dtype=bool)
        lut[script_ids] = True
        in_group = nb.letter & lut[nb.script]
    arr = np.where(in_group, nb.lower, SPACE)
    is_sp = arr == SPACE
    prev_sp = np.empty_like(is_sp)
    prev_sp[0] = False  # keep position 0 (the global leading space)
    prev_sp[1:] = is_sp[:-1]
    keep = ~(is_sp & prev_sp)
    keep[0] = True
    return arr[keep], nb.rid[keep]


def utf8_offsets(arr: np.ndarray) -> np.ndarray:
    """Byte offset of each codepoint (plus final end offset) when `arr` is
    encoded as UTF-8. Shape: len(arr) + 1."""
    u8len = (1 + (arr > 0x7F).astype(np.int32) + (arr > 0x7FF) + (arr > 0xFFFF))
    out = np.empty(len(arr) + 1, dtype=np.int32)
    out[0] = 0
    np.cumsum(u8len, out=out[1:])
    return out


def encode_utf8(arr: np.ndarray) -> np.ndarray:
    """Encode a codepoint array to a padded uint8 UTF-8 buffer (one C-level
    round-trip through str; no per-row Python)."""
    s = arr.astype("<u4").tobytes()
    text = s.decode("utf-32-le")
    raw = text.encode("utf-8")
    buf = np.frombuffer(raw, dtype=np.uint8)
    return np.concatenate([buf, np.zeros(32, dtype=np.uint8)])


def subset_norm_batch(nb: NormBatch, rows: np.ndarray) -> NormBatch:
    """Row-subset of a NormBatch, equal to normalize_batch of the subset
    texts (used by the retry stream reuse, detect.py).

    Why equality holds: the joined stream is ' ' t0 ' ' t1 ' ' ... with
    each row owning its chars + ONE trailing space (row 0 additionally
    owns the global leading space), so keeping the rows' positions
    preserves every per-row segment verbatim and every row boundary
    remains a single space. The only repair needed: when row 0 is not in
    the subset, the stream lost its global leading space -- prepend one
    owned by the new first row (exactly what normalize_batch emits).

    `rows` must be sorted ascending (np.flatnonzero order).
    """
    # boolean-LUT membership: O(N) gather instead of np.isin's
    # O(N log R) sort-based path (measured ~5x on retry-sized subsets).
    # The kept positions are materialized ONCE as indices (each boolean
    # gather re-scans the mask; fancy-index gathers don't), and old->new
    # row ids come from an O(K) remap LUT rather than a per-char binary
    # search.
    lut = np.zeros(nb.n, dtype=bool)
    lut[rows] = True
    kidx = np.flatnonzero(lut[nb.rid])
    remap = np.zeros(nb.n, dtype=np.int32)
    remap[rows] = np.arange(len(rows), dtype=np.int32)
    new_rid = remap[nb.rid[kidx]]
    sub = dict(cp=nb.cp[kidx], rid=new_rid, u8len=nb.u8len[kidx],
               script=nb.script[kidx], letter=nb.letter[kidx],
               lower=nb.lower[kidx])
    if len(rows) and rows[0] != 0:
        # the global leading space belongs to row 0 and was dropped with
        # it; the new first row owns the replacement (normalize_batch
        # layout)
        script_t, _, _ = ut.tables()
        sub["cp"] = np.concatenate(
            [[SPACE], sub["cp"]]).astype(np.uint32)
        sub["rid"] = np.concatenate([[0], sub["rid"]]).astype(np.int32)
        sub["u8len"] = np.concatenate([[1], sub["u8len"]]).astype(np.int8)
        sub["script"] = np.concatenate(
            [[script_t[32]], sub["script"]]).astype(np.uint8)
        sub["letter"] = np.concatenate([[False], sub["letter"]])
        sub["lower"] = np.concatenate([[SPACE], sub["lower"]]).astype(np.uint32)
    return NormBatch(n=len(rows), text_bytes=nb.text_bytes[rows],
                     has_replacement=nb.has_replacement[rows], **sub)
