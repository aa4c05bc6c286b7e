"""The frozen-expected oracle fixtures (tools/freeze_expected.py) must be
re-derivable from the current kernels: a kernel change that shifts any
langid / keep_drop / span label fails here until the fixtures are
intentionally re-frozen. No JVM needed — pure single-node recompute."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
import pytest

from tools.freeze_expected import (BPE_ENCODE_FILE, BPE_MERGES_FILE,
                                   COMPRESSION_FILE, JPEG_COLOR_FILE,
                                   JPEG_FEATURES_FILE, KEEP_DROP_FILE,
                                   LANGID_FILE, MEDIA_FEATURES_FILE,
                                   SPANS_FILE, THUMBS_FILE,
                                   UNI_ENCODE_FILE, UNI_VOCAB_FILE,
                                   VIDEO_FEATURES_FILE, WP_ENCODE_FILE,
                                   WP_VOCAB_FILE, compute_fixtures)

SF_DIR = "/root/testdata/sf0.01"
FIXDIR = Path(__file__).parent / "data"


@pytest.fixture(scope="module")
def recomputed():
    if not Path(SF_DIR).exists():
        pytest.skip("sf0.01 testdata not present")
    return compute_fixtures(SF_DIR)


@pytest.mark.parametrize("fname", [LANGID_FILE, KEEP_DROP_FILE, SPANS_FILE,
                                   MEDIA_FEATURES_FILE, JPEG_FEATURES_FILE,
                                   JPEG_COLOR_FILE, VIDEO_FEATURES_FILE,
                                   COMPRESSION_FILE, THUMBS_FILE,
                                   BPE_MERGES_FILE, BPE_ENCODE_FILE,
                                   UNI_VOCAB_FILE, UNI_ENCODE_FILE,
                                   WP_VOCAB_FILE, WP_ENCODE_FILE])
def test_fixture_matches_recompute(recomputed, fname):
    frozen = pq.read_table(FIXDIR / fname)
    fresh = recomputed[fname]
    assert fresh.schema.equals(frozen.schema), (
        f"{fname}: schema drifted;\nfresh={fresh.schema}\nfrozen={frozen.schema}")
    assert fresh.num_rows == frozen.num_rows
    # byte-level equality, doubles included: the driver's value hash is
    # exact, so the frozen truth must be bit-identical to a recompute
    assert fresh.equals(frozen), (
        f"{fname}: content drifted — re-freeze with tools/freeze_expected.py "
        f"only if the kernel change is intentional")


def test_fixture_rowcounts():
    langid = pq.read_table(FIXDIR / LANGID_FILE)
    kd = pq.read_table(FIXDIR / KEEP_DROP_FILE)
    spans = pq.read_table(FIXDIR / SPANS_FILE)
    assert langid.num_rows == kd.num_rows == 500  # sf0.01 transcripts
    assert spans.num_rows > 500  # multilingual rows emit several spans
    mf = pq.read_table(FIXDIR / MEDIA_FEATURES_FILE)
    assert mf.num_rows == 500 and mf.num_columns == 18
