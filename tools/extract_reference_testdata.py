"""Extract CLD2's bundled golden test corpus into JSONL test data.

Parses the PUBLIC reference repo's test fixtures (data, not code):
  - /root/reference/internal/unittest_data.h   -- 424 kTeststr_* C string
    literals (the golden language snippets)
  - /root/reference/internal/cld2_unittest.cc  -- the kTestPair[] table of
    (expected Language enum, kTeststr_* name)  (lines 51-190)
  - /root/reference/internal/generated_language.cc -- Language enum name ->
    ISO code mapping (kLanguageToCode)

Outputs:
  tests/data/cld2_unittest_pairs.jsonl  -- one {case_id, expected_lang, text,
                                           category} per kTestPair entry
  cld2_spark/model/corpus.jsonl         -- every named snippet with its
                                           (lang, script) parsed from the
                                           kTeststr_<lang>_<Script> name; used
                                           as the deterministic model-training
                                           corpus (no external data allowed).

Run:  python tools/extract_reference_testdata.py
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REF = Path("/root/reference/internal")
REPO = Path(__file__).resolve().parent.parent

C_ESCAPES = {
    "n": b"\n", "t": b"\t", "r": b"\r", "0": b"\x00", "\\": b"\\",
    '"': b'"', "'": b"'", "a": b"\a", "b": b"\b", "f": b"\f", "v": b"\v",
}


def parse_c_string_literals(src: str) -> dict[str, bytes]:
    """Parse `const char* kTeststr_X = "..." "...";` into name -> raw bytes."""
    out: dict[str, bytes] = {}
    # Find declarations: name, then everything to the terminating semicolon.
    for m in re.finditer(
        r"(kTeststr_\w+)\s*(?:\[\])?\s*=\s*((?:\s*\"(?:[^\"\\]|\\.)*\")+)\s*;",
        src,
        re.S,
    ):
        name, body = m.group(1), m.group(2)
        buf = bytearray()
        for lit in re.finditer(r'"((?:[^"\\]|\\.)*)"', body, re.S):
            s = lit.group(1)
            i = 0
            while i < len(s):
                c = s[i]
                if c != "\\":
                    buf += c.encode("utf-8")
                    i += 1
                    continue
                nxt = s[i + 1]
                if nxt == "x":
                    j = i + 2
                    k = j
                    while k < len(s) and k < j + 2 and s[k] in "0123456789abcdefABCDEF":
                        k += 1
                    buf.append(int(s[j:k], 16))
                    i = k
                elif nxt.isdigit():
                    j = i + 1
                    k = j
                    while k < len(s) and k < j + 3 and s[k] in "01234567":
                        k += 1
                    buf.append(int(s[j:k], 8))
                    i = k
                else:
                    buf += C_ESCAPES.get(nxt, nxt.encode())
                    i += 2
        out[name] = bytes(buf)
    return out


def parse_language_codes() -> dict[str, str]:
    """Language enum name -> ISO code, from generated_language.cc tables."""
    src = (REF / "generated_language.cc").read_text(errors="replace")
    names_block = re.search(
        r"kLanguageToName\[kLanguageToNameSize\] = \{(.*?)^\};", src, re.S | re.M
    ).group(1)
    codes_block = re.search(
        r"kLanguageToCode\[kLanguageToCodeSize\] = \{(.*?)^\};", src, re.S | re.M
    ).group(1)
    # entries like:   "ENGLISH",   // 0 -> actually names are strings; but the
    # enum order also appears in generated_language.h. Use the header instead.
    hdr = (REF / "generated_language.h").read_text(errors="replace")
    enum_block = re.search(r"typedef enum \{(.*?)\} Language;", hdr, re.S).group(1)
    enum_names = []
    for em in re.finditer(r"^\s*([A-Z0-9_]+)\s*=\s*(\d+)", enum_block, re.M):
        enum_names.append((int(em.group(2)), em.group(1)))
    enum_names.sort()
    codes = re.findall(r'"([^"]*)"', codes_block)
    _ = names_block
    return {name: codes[idx] for idx, name in enum_names if idx < len(codes)}


def parse_test_pairs() -> list[tuple[str, str]]:
    """(expected Language enum name, kTeststr name) in kTestPair[] order."""
    src = (REF / "cld2_unittest.cc").read_text(errors="replace")
    block = re.search(r"kTestPair\[\] = \{(.*?)^\};", src, re.S | re.M).group(1)
    pairs = []
    for line in block.splitlines():
        line = line.split("//")[0]
        m = re.search(r"\{\s*([A-Z0-9_]+)\s*,\s*(kTeststr_\w+)\s*\}", line)
        if m:
            pairs.append((m.group(1), m.group(2)))
    return pairs


SCRIPT1TO1 = {  # kTeststr suffixes recognized purely by script (RTypeOne)
    "Armn", "Cher", "Thaa", "Geor", "Grek", "Gujr", "Cans", "Knda", "Khmr",
    "Laoo", "Limb", "Mlym", "Orya", "Guru", "Sinh", "Syrc", "Tglg", "Taml",
    "Telu", "Thai", "Mymr", "Mong",
}


def categorize(tname: str) -> str:
    if "bad_UTF8" in tname:
        return "bad_utf8"
    if tname == "kTeststr_version":
        return "version_canary"
    if "_close" in tname:
        return "close_pair"
    if "fr_en" in tname:
        return "mixed"
    suffix = tname.rsplit("_", 1)[-1]
    if suffix in ("Hans", "Hant", "Hani"):
        return "cjk"
    if suffix in SCRIPT1TO1:
        return "script1to1"
    return "quadgram"


def main() -> None:
    strings = parse_c_string_literals(
        (REF / "unittest_data.h").read_text(errors="replace")
    )
    # also pick up kTeststr_en defined at the top of cld2_unittest.cc
    strings.update(
        parse_c_string_literals((REF / "cld2_unittest.cc").read_text(errors="replace"))
    )
    lang_codes = parse_language_codes()
    pairs = parse_test_pairs()

    out_pairs = REPO / "tests" / "data" / "cld2_unittest_pairs.jsonl"
    seen_case = {}
    with out_pairs.open("w") as f:
        for enum_name, tname in pairs:
            if tname not in strings:
                continue
            raw = strings[tname]
            text = raw.decode("utf-8", errors="replace")
            code = lang_codes.get(enum_name, "un")
            base = tname.replace("kTeststr_", "")
            n = seen_case.get(base, 0)
            seen_case[base] = n + 1
            case_id = base if n == 0 else f"{base}#{n}"
            f.write(json.dumps({
                "case_id": case_id,
                "expected_lang": code,
                "expected_enum": enum_name,
                "text": text,
                "category": categorize(tname),
                "had_invalid_utf8": raw.decode("utf-8", "replace") != raw.decode("utf-8", "ignore") or b"\xff" in raw or ("�" in text),
            }, ensure_ascii=False) + "\n")

    # Training corpus: every kTeststr snippet whose name encodes lang+script.
    out_corpus = REPO / "cld2_spark" / "model" / "corpus.jsonl"
    out_corpus.parent.mkdir(parents=True, exist_ok=True)
    pair_langs = {t: e for e, t in pairs}
    with out_corpus.open("w") as f:
        for tname, raw in sorted(strings.items()):
            cat = categorize(tname)
            if cat in ("bad_utf8", "version_canary", "mixed"):
                continue
            text = raw.decode("utf-8", errors="replace")
            base = tname.replace("kTeststr_", "")
            parts = base.split("_")
            enum_name = pair_langs.get(tname)
            lang = lang_codes.get(enum_name) if enum_name else None
            if lang is None:
                # derive from name prefix, e.g. az_Latn -> az
                lang = parts[0]
            script = parts[-1] if len(parts) > 1 else "Latn"
            script = re.sub(r"\d+$", "", script)  # blu_Latn2 -> Latn
            if base.endswith("_close"):
                script = "Latn"
            if lang == "xx":
                lang = "un"
            f.write(json.dumps({
                "name": base, "lang": lang, "script": script,
                "category": cat, "text": text,
            }, ensure_ascii=False) + "\n")

    print(f"wrote {out_pairs} ({sum(1 for _ in out_pairs.open())} pairs)")
    print(f"wrote {out_corpus} ({sum(1 for _ in out_corpus.open())} snippets)")


if __name__ == "__main__":
    main()
