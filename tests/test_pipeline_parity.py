"""Spark pipeline vs single-node oracle: the north-rule F1 gate.

The Spark `run_pipeline` output must match the deterministic pandas oracle
(cld2_spark/pipeline/oracle.py) per turn: keep/drop F1 >= 0.99 (we assert
exact agreement -- shared kernels), identical drop reasons, and EXACT
scrubbed-text equality under stable (conv_id, turn_idx) ordering.
"""

import pandas as pd
import pytest

from cld2_spark.pipeline.oracle import oracle_labels
from cld2_spark.pipeline.stages import run_pipeline
from cld2_spark.sources.transcripts import spark_transcripts, synth_transcripts_pandas

N_TURNS = 2000


@pytest.fixture(scope="module")
def outputs(spark):
    pdf = synth_transcripts_pandas(N_TURNS, mega_turns=100)
    want = oracle_labels(pdf)
    df = spark_transcripts(spark, N_TURNS, mega_turns=100, n_partitions=8)
    got = (run_pipeline(df)
           .toPandas()
           .sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    return want, got


def test_keep_drop_f1(outputs):
    want, got = outputs
    assert len(want) == len(got)
    w = want["keep"].to_numpy()
    g = got["keep"].to_numpy()
    tp = (w & g).sum()
    fp = (~w & g).sum()
    fn = (w & ~g).sum()
    f1 = 2 * tp / max(1, 2 * tp + fp + fn)
    assert f1 >= 0.99, f"keep/drop F1={f1:.4f} (tp={tp} fp={fp} fn={fn})"
    # with shared kernels the match should in fact be exact:
    assert (w == g).all()


def test_drop_reasons_match(outputs):
    want, got = outputs
    w = want["drop_reason"].fillna("keep")
    g = got["drop_reason"].fillna("keep")
    mismatch = (w != g).sum()
    assert mismatch == 0, f"{mismatch} drop_reason mismatches"
    # every reason is exercised by the fixture
    assert set(w.unique()) >= {"keep", "too_short", "langid_unreliable",
                               "low_quality", "toxicity"}


def test_scrubbed_text_exact_equality(outputs):
    want, got = outputs
    assert (want["scrubbed_text"].to_numpy() == got["scrubbed_text"].to_numpy()).all()


def test_scrub_masks_pii(outputs):
    want, _ = outputs
    scrubbed = " ".join(want["scrubbed_text"].tolist())
    assert "jane.doe@example.com" not in scrubbed
    assert "123-45-6789" not in scrubbed
    assert "<EMAIL>" in scrubbed and "<SSN>" in scrubbed and "<PHONE>" in scrubbed


def test_lang_and_pct_match(outputs):
    want, got = outputs
    assert (want["lang1"].to_numpy() == got["lang1"].to_numpy()).all()
    assert (want["pct1"].to_numpy() == got["pct1"].to_numpy()).all()
    assert (want["is_reliable"].to_numpy() == got["is_reliable"].to_numpy()).all()


def test_ordering_invariant(outputs):
    _, got = outputs
    key = pd.MultiIndex.from_frame(got[["conv_id", "turn_idx"]])
    assert key.is_monotonic_increasing
    assert not key.duplicated().any()
