"""Parse the reference checkout's generated model tables into NumPy.

The CLD2 checkout at /root/reference ships most of its scoring model as
generated C++ arrays (only the main quadgram blobs are stripped, see
.MISSING_LARGE_BLOBS). This tool parses them so the Spark engine scores
with the REAL reference model instead of self-trained placeholders
(VERDICT r1 "What's missing" #1):

  - CLD2TableSummary word/bigram tables (internal/cld2tablesummary.h:27-49):
      kDeltaOcta_obj      internal/cld2_generated_deltaoctachrome.cc
      kDistinctOcta_obj   internal/cld2_generated_distinctoctachrome.cc
      kCjkDeltaBi_obj     internal/cld_generated_cjk_delta_bi_32.cc
      kCjkCompat_obj      internal/cld2_generated_cjk_compatible.cc
  - CJK unigram UTF-8 property DFA (internal/cld_generated_cjk_uni_prop_80.cc),
    decoded to a dense codepoint -> property map by simulating
    UTF8GenericPropertyBigOneByte (internal/utf8statetable.cc:271-321)
    over every codepoint's UTF-8 encoding.
  - expected scores kAvgDeltaOctaScore[614*4]
    (internal/cld_generated_score_quad_octa_1024_256.cc:57).
  - langprob decode table kLgProbV2Tbl (internal/cldutil_shared.h:62-308)
    and the pslang maps kPLangToLanguageLatn/Othr + kLanguageToCode
    (internal/generated_language.cc:647,3022,3282).

Decode chain (internal/scoreonescriptspan.cc:936-964, cldutil.cc:128-138):
  bucket keyvalue -> indirect = keyvalue & ~keymask
  indirect <  size_one: one langprob = ind[indirect]
  indirect >= size_one: two langprobs at ind[2*indirect - size_one .. +1]
  langprob uint32: byte0 = subscript into kLgProbV2Tbl (probs at entry
  bytes 5..7), bytes1..3 = per-script language numbers (0 = unused)

Output: cld2_spark/model/reference_tables.npz, consumed by build_model.py.
Only Apache-2.0 generated DATA is extracted; all code here is original.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/internal")
OUT = Path(__file__).resolve().parent.parent / "cld2_spark" / "model" / "reference_tables.npz"

X_EXIT = 240  # kExitIllegalStructure (internal/utf8statetable.h:52)

_MACROS = {"X__": X_EXIT, "RJ_": 241 + 1}  # only X__ occurs in property tables


def _strip_comments(src: str) -> str:
    src = re.sub(r"//[^\n]*", "", src)
    return re.sub(r"/\*.*?\*/", "", src, flags=re.S)


def _array_body(src: str, decl_regex: str) -> str:
    """Return the text between the braces of an array initializer."""
    m = re.search(decl_regex, src)
    if not m:
        raise ValueError(f"declaration not found: {decl_regex}")
    start = src.index("{", m.end())
    depth, i = 0, start
    while True:
        c = src[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return src[start + 1:i]
        i += 1


def parse_int_array(path: Path, name: str, dtype=np.int64) -> np.ndarray:
    src = _strip_comments(path.read_text())
    body = _array_body(src, rf"{re.escape(name)}\s*\[[^]]*\]\s*=\s*")
    toks = re.findall(r"0[xX][0-9a-fA-F]+|-?\d+|[A-Za-z_][A-Za-z0-9_]*", body)
    vals = []
    for t in toks:
        if t in _MACROS:
            vals.append(_MACROS[t])
        elif t.lower().startswith("0x"):
            vals.append(int(t, 16))
        elif re.fullmatch(r"-?\d+", t):
            vals.append(int(t))
        # bare identifiers other than macros (shouldn't occur) are skipped
    # via int64 then overflow-cast: the DFA tables store SIGNED relative
    # offsets in uint8 cells (read back via int8 reinterpret, like the C)
    return np.array(vals, dtype=np.int64).astype(dtype)


def parse_scalar(path: Path, name: str) -> int:
    src = _strip_comments(path.read_text())
    m = re.search(rf"{re.escape(name)}\s*=\s*(0[xX][0-9a-fA-F]+|\d+)", src)
    if not m:
        raise ValueError(f"scalar not found: {name} in {path.name}")
    return int(m.group(1), 0)


# ------------------------------------------------------------ languages ----

def parse_language_enum() -> dict[str, int]:
    src = _strip_comments((REF / "generated_language.h").read_text())
    return {m.group(1): int(m.group(2))
            for m in re.finditer(r"([A-Z][A-Za-z0-9_]*)\s*=\s*(\d+)", src)}


def parse_language_codes() -> list[str]:
    src = _strip_comments((REF / "generated_language.cc").read_text())
    body = _array_body(src, r"kLanguageToCode\s*\[[^]]*\]\s*=\s*")
    return re.findall(r'"([^"]*)"', body)


def parse_plang_maps(enum: dict[str, int]) -> tuple[np.ndarray, np.ndarray]:
    src = _strip_comments((REF / "generated_language.cc").read_text())
    out = []
    for name in ("kPLangToLanguageLatn", "kPLangToLanguageOthr"):
        body = _array_body(src, rf"{name}\s*\[[^]]*\]\s*=\s*")
        ids = [enum[t] for t in re.findall(r"[A-Z][A-Za-z0-9_]*", body)]
        if len(ids) != 256:
            raise ValueError(f"{name}: expected 256 entries, got {len(ids)}")
        out.append(np.array(ids, dtype=np.uint16))
    return out[0], out[1]


def parse_lgprob_tbl() -> np.ndarray:
    arr = parse_int_array(REF / "cldutil_shared.h", "kLgProbV2Tbl", np.uint8)
    if arr.size != 240 * 8:
        raise ValueError(f"kLgProbV2Tbl size {arr.size}")
    return arr.reshape(240, 8)


# -------------------------------------------------- CLD2TableSummary -------

def parse_summary(path: Path, prefix: str) -> dict:
    """Parse one generated CLD2TableSummary (buckets + indirects + meta)."""
    buckets = parse_int_array(path, prefix, np.uint32).reshape(-1, 4)
    ind = parse_int_array(path, prefix + "Ind", np.uint32)
    size_one = parse_scalar(path, prefix + "SizeOne")
    keymask = parse_scalar(path, prefix + "KeyMask")
    n = parse_scalar(path, prefix + "Size")
    if buckets.shape[0] != n:
        raise ValueError(f"{prefix}: {buckets.shape[0]} buckets != Size {n}")
    return {"buckets": buckets, "ind": ind,
            "size_one": size_one, "keymask": keymask}


def decode_langprobs(langprob: int, lgprob: np.ndarray) -> list[tuple[int, int]]:
    """One packed langprob -> [(pslang, qprob)] (ProcessProbV2Tote,
    internal/cldutil.cc:128-138)."""
    sub = langprob & 0xFF
    entry = lgprob[sub]
    out = []
    for j in range(3):
        ps = (langprob >> (8 * (j + 1))) & 0xFF
        if ps > 0:
            out.append((ps, int(entry[5 + j])))
    return out


def decode_summary(summ: dict, lgprob: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All slots -> (pslangs (n,4,6) uint8 0=none, qprobs (n,4,6) uint8)."""
    buckets, ind = summ["buckets"], summ["ind"]
    size_one, keymask = summ["size_one"], summ["keymask"]
    n = buckets.shape[0]
    pslangs = np.zeros((n, 4, 6), dtype=np.uint8)
    qprobs = np.zeros((n, 4, 6), dtype=np.uint8)
    ind_mask = (~np.uint32(keymask)) & np.uint32(0xFFFFFFFF)
    nz = np.argwhere(buckets != 0)
    for b, s in nz:
        indirect = int(buckets[b, s] & ind_mask)
        pairs: list[tuple[int, int]] = []
        if indirect < size_one:
            lp = int(ind[indirect])
            if lp:
                pairs.extend(decode_langprobs(lp, lgprob))
        else:
            idx = 2 * indirect - size_one
            for lp in (int(ind[idx]), int(ind[idx + 1])):
                if lp:
                    pairs.extend(decode_langprobs(lp, lgprob))
        for j, (ps, q) in enumerate(pairs[:6]):
            pslangs[b, s, j] = ps
            qprobs[b, s, j] = q
    return pslangs, qprobs


# ------------------------------------------------------ CJK unigram DFA ----

def parse_cjk_uni_props() -> np.ndarray:
    """Simulate the CjkUni property DFA for every codepoint.

    Returns uint8[0x110000] of property values (indirect subscripts into
    the kCjkCompat indirect table); 0 = no property. Follows
    UTF8GenericPropertyBigOneByte exactly (entry_shift=6; the 3rd-to-last
    byte offset is x16 and the 2nd-to-last is a SIGNED relative offset,
    internal/utf8statetable.cc:271-321)."""
    path = REF / "cld_generated_cjk_uni_prop_80.cc"
    tbl = parse_int_array(path, "cld_generated_CjkUni", np.uint8)
    state0 = parse_scalar(path, "cld_generated_CjkUni_STATE0")
    shift = parse_scalar(path, "cld_generated_CjkUni_SHIFT")
    assert shift == 6, "interpreter below assumes entry_shift 6"
    t0 = state0  # byte offset of state0 within tbl

    props = np.zeros(0x110000, dtype=np.uint8)
    cps = np.arange(0x110000, dtype=np.int64)

    # 1-byte: props = tbl[t0 + cp]
    props[:0x80] = tbl[t0:t0 + 0x80]

    def step(tbl_off: np.ndarray, byte: np.ndarray) -> np.ndarray:
        return tbl[tbl_off + byte].astype(np.int64)

    # 2-byte chars: c0 = 0xC0|cp>>6, c1 = 0x80|cp&0x3F
    cp2 = cps[(cps >= 0x80) & (cps < 0x800)]
    e = step(np.full(len(cp2), t0), 0xC0 | (cp2 >> 6))
    tbl_off = t0 + (e << shift)
    props[cp2] = tbl[tbl_off + (0x80 | (cp2 & 0x3F))]

    # 3-byte chars: e0 absolute x16, e1 SIGNED relative, e2 property
    cp3 = cps[(cps >= 0x800) & (cps < 0x10000)]
    cp3 = cp3[(cp3 < 0xD800) | (cp3 > 0xDFFF)]  # skip surrogates
    e0 = step(np.full(len(cp3), t0), 0xE0 | (cp3 >> 12))
    tbl_off = t0 + (e0 << (shift + 4))
    e1 = tbl[tbl_off + (0x80 | ((cp3 >> 6) & 0x3F))].astype(np.int8).astype(np.int64)
    tbl_off = tbl_off + (e1 << shift)
    props[cp3] = tbl[tbl_off + (0x80 | (cp3 & 0x3F))]

    # 4-byte chars: e0 absolute, e1 absolute x16, e2 SIGNED relative, e3 prop
    cp4 = cps[cps >= 0x10000]
    e0 = step(np.full(len(cp4), t0), 0xF0 | (cp4 >> 18))
    tbl_off = t0 + (e0 << shift)
    e1 = tbl[tbl_off + (0x80 | ((cp4 >> 12) & 0x3F))].astype(np.int64)
    tbl_off = t0 + (e1 << (shift + 4))
    e2 = tbl[tbl_off + (0x80 | ((cp4 >> 6) & 0x3F))].astype(np.int8).astype(np.int64)
    tbl_off = tbl_off + (e2 << shift)
    props[cp4] = tbl[tbl_off + (0x80 | (cp4 & 0x3F))]

    props[props >= X_EXIT] = 0  # exit codes are not properties
    return props


# ----------------------------------------------------------------- main ----

def main() -> None:
    enum = parse_language_enum()
    codes = parse_language_codes()
    plang_latn, plang_othr = parse_plang_maps(enum)
    lgprob = parse_lgprob_tbl()

    out: dict[str, np.ndarray] = {
        "lang_codes": np.array(codes),
        "plang_latn": plang_latn,
        "plang_othr": plang_othr,
        "lgprob": lgprob,
    }

    tables = [
        ("word_delta", REF / "cld2_generated_deltaoctachrome.cc", "kDeltaOctaChrome1015"),
        ("word_distinct", REF / "cld2_generated_distinctoctachrome.cc", None),
        ("cjk_bi", REF / "cld_generated_cjk_delta_bi_32.cc", None),
    ]
    for name, path, prefix in tables:
        if prefix is None:
            # Infer the generated prefix from the <Name>Size declaration
            src = _strip_comments(path.read_text())
            m = re.search(r"static const uint32 (k\w+?)Size = \d+", src)
            prefix = m.group(1)
        summ = parse_summary(path, prefix)
        pslangs, qprobs = decode_summary(summ, lgprob)
        out[f"{name}_keys"] = summ["buckets"]
        out[f"{name}_keymask"] = np.uint32(summ["keymask"])
        out[f"{name}_pslangs"] = pslangs
        out[f"{name}_qprobs"] = qprobs
        print(f"{name}: {summ['buckets'].shape[0]} buckets, "
              f"{int((summ['buckets'] != 0).sum())} slots, prefix {prefix}")

    # CJK unigrams: DFA propval p -> TWO langprobs at kCompatTableInd[2p, 2p+1]
    # (kCompatTableSizeOne = 0, internal/cld2_generated_cjk_compatible.cc:39)
    compat_ind = parse_int_array(
        REF / "cld2_generated_cjk_compatible.cc", "kCompatTableInd", np.uint32)
    props = parse_cjk_uni_props()
    nz = np.flatnonzero(props)
    m = len(nz)
    uni_ps = np.zeros((m, 6), dtype=np.uint8)
    uni_q = np.zeros((m, 6), dtype=np.uint8)
    for i, cp in enumerate(nz):
        p = int(props[cp])
        pairs: list[tuple[int, int]] = []
        for lp in (int(compat_ind[2 * p]), int(compat_ind[2 * p + 1])):
            if lp:
                pairs.extend(decode_langprobs(lp, lgprob))
        for j, (ps, q) in enumerate(pairs[:6]):
            uni_ps[i, j] = ps
            uni_q[i, j] = q
    out["cjk_uni_cp"] = nz.astype(np.uint32)
    out["cjk_uni_pslangs"] = uni_ps
    out["cjk_uni_qprobs"] = uni_q
    print(f"cjk_uni: {m} codepoints with properties "
          f"(range U+{nz.min():04X}..U+{nz.max():04X})")

    score = parse_int_array(REF / "cld_generated_score_quad_octa_1024_256.cc",
                            "kAvgDeltaOctaScore", np.int16).reshape(614, 4)
    out["expected_score"] = score

    # closest-alt-language merge table for RemoveUnreliableLanguages (P7):
    # entries `(NN >= kMinCorrPercent) ? ALT : UNKNOWN_LANGUAGE, // SRC`
    # subscripted by Language, kMinCorrPercent = 24
    # (internal/compact_lang_det_impl.cc:252-427)
    impl = (REF / "compact_lang_det_impl.cc").read_text()
    body = impl.split("kClosestAltLanguage[] = {", 1)[1].split("};", 1)[0]
    entries = re.findall(
        r"\(\s*(\d+)\s*>=\s*kMinCorrPercent\s*\)\s*\?\s*(\w+)\s*:", body)
    unknown = enum["UNKNOWN_LANGUAGE"]
    closest = np.full(614, unknown, dtype=np.int16)
    for i, (corr, alt) in enumerate(entries):
        if int(corr) >= 24 and alt in enum and alt != "Unknown":
            closest[i] = enum[alt]
    out["closest_alt"] = closest
    print(f"closest_alt: {len(entries)} entries, "
          f"{int((closest != unknown).sum())} active merges")

    # hint tables (J8/K3): lang-tag (full + truncated) and TLD lookups with
    # packed (lang + weight<<10) priors, weights Wn = n qprob steps
    # (internal/compact_lang_det_hint_code.cc:60-112,102-644,647-970)
    hint_src = (REF / "compact_lang_det_hint_code.cc").read_text()

    def parse_hint_table(name: str) -> tuple[list, list, list]:
        body = hint_src.split(f"{name}[", 1)[1].split("};", 1)[0]
        keys, lang_ids, weights = [], [], []
        pat = (r'\{"([^"]+)",\s*(?:"[^"]*",\s*)?'         # key (+ opt code col)
               r'([A-Z][A-Za-z0-9_]*)\s*\+\s*W(\d+),\s*'  # lang1 + W
               r'(?:([A-Z][A-Za-z0-9_]*)\s*\+\s*W(\d+)|0)')  # lang2 + W | 0
        for m in re.finditer(pat, body):
            key, l1, w1, l2, w2 = m.groups()
            keys.append(key)
            lang_ids.append([enum.get(l1, 0), enum.get(l2, 0) if l2 else 0])
            weights.append([int(w1), int(w2) if w2 else 0])
        return keys, lang_ids, weights

    for nm, cc_name in (("hint_tag1", "kCLDLangTagsHintTable1"),
                        ("hint_tag2", "kCLDLangTagsHintTable2"),
                        ("hint_tld", "kCLDTLDHintTable")):
        keys, lids, ws = parse_hint_table(cc_name)
        out[f"{nm}_keys"] = np.array(keys)
        out[f"{nm}_langs"] = np.array(lids, dtype=np.int16)
        out[f"{nm}_weights"] = np.array(ws, dtype=np.int16)
        print(f"{nm}: {len(keys)} entries")

    # named-entity table (S4 long tail, VERDICT r2 #8): kNameToEntity,
    # alphabetical (name, codepoint) pairs used by ReadEntity/EntityToBuffer
    # (internal/getonescriptspan.cc:393-469, internal/generated_entities.cc)
    ent_src = _strip_comments((REF / "generated_entities.cc").read_text())
    ent_body = ent_src.split("kNameToEntity[", 1)[1].split("};", 1)[0]
    ents = re.findall(r'\{"([^"]+)",\s*(\d+)\}', ent_body)
    n_decl = int(re.search(r"kNameToEntitySize = (\d+)", ent_src).group(1))
    assert len(ents) == n_decl, (len(ents), n_decl)
    out["entity_names"] = np.array([e[0] for e in ents])
    out["entity_cps"] = np.array([int(e[1]) for e in ents], dtype=np.uint32)
    print(f"entities: {len(ents)} named entries")

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({OUT.stat().st_size // 1024} KB)")


if __name__ == "__main__":
    sys.exit(main())
