"""Codepoint -> script / letter / lowercase lookup tables.

Replaces CLD2's generated UTF-8 property state tables
(reference: internal/utf8prop_lettermarkscriptnum.h, classification entry
point GetUTF8LetterScriptNum at internal/getonescriptspan.cc:1083-1088) with
flat NumPy arrays indexed by codepoint -- the shape a vectorized Arrow UDF
wants (SURVEY.md P2).

Scripts follow CLD2's ULScript enum semantics (reference:
internal/generated_ulscript.cc): all CJK scripts (Han, Hiragana, Katakana,
Hangul, Bopomofo) merge into ULScript Hani for span purposes
(internal/generated_ulscript.h:30-134), but we keep distinct internal
subtype ids so the CJK scorer can separate kana/hangul/han.

Recognition types per script mirror kULScriptToRtype and default languages
mirror kULScriptToDefaultLang (internal/generated_ulscript.cc; semantics at
internal/lang_script.h:54-69):
  RTYPE_NONE  -- script recognized but maps to no language (score nothing)
  RTYPE_ONE   -- script implies exactly one language (score bytes directly)
  RTYPE_MANY  -- quadgram scoring over a per-script language set
  RTYPE_CJK   -- unigram/bigram scoring

Tables are built once per process from public Unicode block ranges +
`unicodedata` letter categories and cached at module level (executors build
them lazily on first batch; ~100ms).
"""

from __future__ import annotations

import sys
import unicodedata

import numpy as np

MAX_CP = 0x30000  # covers BMP + SIP Han; above this -> Common

# Recognition types
RTYPE_NONE, RTYPE_ONE, RTYPE_MANY, RTYPE_CJK = 0, 1, 2, 3

# Internal script ids (dense, ours -- not CLD2's numbering).
SCRIPTS: list[tuple[str, int, str | None]] = [
    # (name, rtype, default_lang or None)
    ("Common", RTYPE_NONE, None),         # 0
    ("Latn", RTYPE_MANY, "en"),           # 1
    ("Grek", RTYPE_ONE, "el"),            # 2
    ("Cyrl", RTYPE_MANY, "ru"),           # 3
    ("Armn", RTYPE_ONE, "hy"),            # 4
    ("Hebr", RTYPE_MANY, "iw"),           # 5
    ("Arab", RTYPE_MANY, "ar"),           # 6
    ("Syrc", RTYPE_ONE, "syr"),           # 7
    ("Thaa", RTYPE_ONE, "dv"),            # 8
    ("Deva", RTYPE_MANY, "hi"),           # 9
    ("Beng", RTYPE_MANY, "bn"),           # 10
    ("Guru", RTYPE_ONE, "pa"),            # 11
    ("Gujr", RTYPE_ONE, "gu"),            # 12
    ("Orya", RTYPE_ONE, "or"),            # 13
    ("Taml", RTYPE_ONE, "ta"),            # 14
    ("Telu", RTYPE_ONE, "te"),            # 15
    ("Knda", RTYPE_ONE, "kn"),            # 16
    ("Mlym", RTYPE_ONE, "ml"),            # 17
    ("Sinh", RTYPE_ONE, "si"),            # 18
    ("Thai", RTYPE_ONE, "th"),            # 19
    ("Laoo", RTYPE_ONE, "lo"),            # 20
    ("Tibt", RTYPE_MANY, "bo"),           # 21
    ("Mymr", RTYPE_ONE, "my"),            # 22
    ("Geor", RTYPE_ONE, "ka"),            # 23
    ("Hani", RTYPE_CJK, "ja"),            # 24  (Han; merged CJK)
    ("Ethi", RTYPE_MANY, "am"),           # 25
    ("Cher", RTYPE_ONE, "chr"),           # 26
    ("Cans", RTYPE_ONE, "iu"),            # 27
    ("Khmr", RTYPE_ONE, "km"),            # 28
    ("Mong", RTYPE_ONE, "mn"),            # 29
    ("Tglg", RTYPE_ONE, "tl"),            # 30
    ("Limb", RTYPE_ONE, "lif"),           # 31
    # CJK subtypes (merged to Hani for span purposes, distinct for scoring)
    ("Hira", RTYPE_CJK, "ja"),            # 32
    ("Kata", RTYPE_CJK, "ja"),            # 33
    ("Hang", RTYPE_ONE, "ko"),            # 34
    ("Bopo", RTYPE_CJK, "zh-Hant"),       # 35
]

SCRIPT_ID = {name: i for i, (name, _, _) in enumerate(SCRIPTS)}
N_SCRIPTS = len(SCRIPTS)
RTYPE = np.array([r for _, r, _ in SCRIPTS], dtype=np.int8)
DEFAULT_LANG = [d for _, _, d in SCRIPTS]

# Public Unicode block ranges -> script (inclusive ranges).
_RANGES: list[tuple[int, int, str]] = [
    (0x0041, 0x005A, "Latn"), (0x0061, 0x007A, "Latn"),
    (0x00C0, 0x024F, "Latn"), (0x1E00, 0x1EFF, "Latn"),
    (0x2C60, 0x2C7F, "Latn"), (0xA720, 0xA7FF, "Latn"),
    (0x0370, 0x03FF, "Grek"), (0x1F00, 0x1FFF, "Grek"),
    (0x0400, 0x052F, "Cyrl"), (0x2DE0, 0x2DFF, "Cyrl"), (0xA640, 0xA69F, "Cyrl"),
    (0x0530, 0x058F, "Armn"), (0xFB13, 0xFB17, "Armn"),
    (0x0590, 0x05FF, "Hebr"), (0xFB1D, 0xFB4F, "Hebr"),
    (0x0600, 0x06FF, "Arab"), (0x0750, 0x077F, "Arab"),
    (0x08A0, 0x08FF, "Arab"), (0xFB50, 0xFDFF, "Arab"), (0xFE70, 0xFEFF, "Arab"),
    (0x0700, 0x074F, "Syrc"),
    (0x0780, 0x07BF, "Thaa"),
    (0x0900, 0x097F, "Deva"), (0xA8E0, 0xA8FF, "Deva"),
    (0x0980, 0x09FF, "Beng"),
    (0x0A00, 0x0A7F, "Guru"),
    (0x0A80, 0x0AFF, "Gujr"),
    (0x0B00, 0x0B7F, "Orya"),
    (0x0B80, 0x0BFF, "Taml"),
    (0x0C00, 0x0C7F, "Telu"),
    (0x0C80, 0x0CFF, "Knda"),
    (0x0D00, 0x0D7F, "Mlym"),
    (0x0D80, 0x0DFF, "Sinh"),
    (0x0E00, 0x0E7F, "Thai"),
    (0x0E80, 0x0EFF, "Laoo"),
    (0x0F00, 0x0FFF, "Tibt"),
    (0x1000, 0x109F, "Mymr"), (0xAA60, 0xAA7F, "Mymr"),
    (0x10A0, 0x10FF, "Geor"), (0x2D00, 0x2D2F, "Geor"),
    (0x1100, 0x11FF, "Hang"), (0x3130, 0x318F, "Hang"),
    (0xA960, 0xA97F, "Hang"), (0xAC00, 0xD7FF, "Hang"),
    (0x1200, 0x139F, "Ethi"), (0x2D80, 0x2DDF, "Ethi"),
    (0x13A0, 0x13FF, "Cher"),
    (0x1400, 0x167F, "Cans"),
    (0x1700, 0x171F, "Tglg"),
    (0x1780, 0x17FF, "Khmr"), (0x19E0, 0x19FF, "Khmr"),
    (0x1800, 0x18AF, "Mong"),
    (0x1900, 0x194F, "Limb"),
    (0x3040, 0x309F, "Hira"),
    (0x30A0, 0x30FF, "Kata"), (0x31F0, 0x31FF, "Kata"), (0xFF66, 0xFF9D, "Kata"),
    (0x3100, 0x312F, "Bopo"), (0x31A0, 0x31BF, "Bopo"),
    (0x2E80, 0x2FDF, "Hani"), (0x3400, 0x4DBF, "Hani"),
    (0x4E00, 0x9FFF, "Hani"), (0xF900, 0xFAFF, "Hani"),
    (0x20000, 0x2A6DF, "Hani"),
]

_CACHE: dict[str, np.ndarray] = {}


def _build() -> None:
    script = np.zeros(MAX_CP, dtype=np.uint8)  # 0 = Common
    for lo, hi, name in _RANGES:
        script[lo : min(hi, MAX_CP - 1) + 1] = SCRIPT_ID[name]

    # letter/mark property + SIMPLE (1:1) lowercase map. The reference's
    # utf8repl_lettermarklower table implements Unicode SIMPLE lowercase
    # (verified by compiling UTF8GenericReplace against the table itself:
    # I-dot->i, AumlE->aumlE 1:1, but ligature fi, 'n-apostrophe, Greek iota
    # diacritic combos, and eszett stay UNCHANGED -- i.e. the full-mapping
    # expansion cases of SpecialCasing.txt are NOT applied). Python's
    # str.lower() is the FULL mapping; the two differ only on codepoints
    # whose full lowercase is multi-char, and among those only U+0130
    # (Turkish I-with-dot) has a nontrivial simple lowercase: 'i' (F7,
    # VERDICT r2 #9).
    letter = np.zeros(MAX_CP, dtype=bool)
    lower = np.arange(MAX_CP, dtype=np.uint32)
    # only need per-codepoint properties where a script is assigned
    cps = np.nonzero(script)[0]
    cat = unicodedata.category
    for cp in cps.tolist():
        c = chr(cp)
        k = cat(c)[0]
        if k in ("L", "M"):
            letter[cp] = True
            lo = c.lower()
            if len(lo) == 1:
                lower[cp] = ord(lo)
    lower[0x0130] = ord("i")  # the one full!=simple case with a 1:1 target
    _CACHE["script"] = script
    _CACHE["letter"] = letter
    _CACHE["lower"] = lower


def tables() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (codepoint->script, codepoint->is_letter, codepoint->lowercase)."""
    if "script" not in _CACHE:
        _build()
    return _CACHE["script"], _CACHE["letter"], _CACHE["lower"]


def codepoints_of(joined: str) -> np.ndarray:
    """UTF-32 view of a joined batch string as a uint32 codepoint array."""
    b = joined.encode("utf-32-le" if sys.byteorder == "little" else "utf-32-be")
    return np.frombuffer(b, dtype=np.uint32)
