"""Golden langid accuracy on CLD2's bundled unittest corpus.

Mirrors the reference harness (internal/cld2_unittest.cc:193-263 OneTest:
detected top language must equal the expected language per kTestPair).

The `version_canary` case is handled exactly as the reference does
(internal/cld2_unittest.cc:183-187): its expected language changes on every
quadgram-table rebuild, so it asserts against the value recorded for OUR
table build (the canary still catches accidental model-file drift).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from cld2_spark.kernels.detect import detect_batch

DATA = Path(__file__).parent / "data"

# Expected canary language for model build cld2s-20260816-corpus.
# Update when the table is rebuilt (see reference comment cited above).
VERSION_CANARY_LANG = "es"


def _pairs():
    return [json.loads(line) for line in (DATA / "cld2_unittest_pairs.jsonl").open()]


@pytest.fixture(scope="module")
def results():
    pairs = _pairs()
    res = detect_batch([p["text"] for p in pairs])
    return pairs, res


def test_all_cases_match_expected(results):
    pairs, res = results
    fails = []
    for i, p in enumerate(pairs):
        want = (VERSION_CANARY_LANG if p["category"] == "version_canary"
                else p["expected_lang"])
        got = res["lang1"][i]
        if got != want:
            fails.append((p["case_id"], want, got))
    assert not fails, f"{len(fails)} mismatches: {fails}"


def test_bad_utf8_is_unknown_unreliable(results):
    pairs, res = results
    idx = [i for i, p in enumerate(pairs) if p["category"] == "bad_utf8"]
    assert idx
    for i in idx:
        assert res["lang1"][i] == "un"
        assert not res["is_reliable"][i]


def test_script1to1_cases_fully_reliable(results):
    pairs, res = results
    idx = [i for i, p in enumerate(pairs) if p["category"] == "script1to1"]
    assert len(idx) >= 20
    for i in idx:
        assert res["is_reliable"][i], pairs[i]["case_id"]
        assert res["pct1"][i] >= 95, pairs[i]["case_id"]


def test_percentages_well_formed(results):
    _, res = results
    p1, p2, p3 = res["pct1"], res["pct2"], res["pct3"]
    assert (p1 >= p2).all() and (p2 >= p3).all()
    assert ((p1 + p2 + p3) <= 100).all()
    assert (p1 <= 100).all() and (p2 >= 0).all() and (p3 >= 0).all()


def test_empty_and_whitespace_rows():
    res = detect_batch(["", "   ", "\n\t", "1234 5678 ...!!"])
    assert (res["lang1"] == "un").all()
    assert not res["is_reliable"].any()
    assert res["text_bytes"][0] == 0


def test_mixed_batch_order_stability():
    """Same text must get the same verdict regardless of batch position."""
    pairs = _pairs()
    texts = [p["text"] for p in pairs[:20]]
    a = detect_batch(texts)
    b = detect_batch(list(reversed(texts)))
    assert list(a["lang1"]) == list(reversed(list(b["lang1"])))
    assert list(a["pct1"]) == list(reversed(list(b["pct1"])))
