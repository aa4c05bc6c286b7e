"""Retry stream-reuse (round 3): pass 2 subsets pass 1's cached gram/word
streams for unmodified rows instead of re-normalizing and re-hashing.

The reuse must be EXACTLY behavior-preserving: rows are space-delimited in
every batch stream and all filters (repeat, predicted, word keep) are
within-row, so a row-level subset of the pass-1 stream equals the stream a
fresh pass-2 batch would compute. These tests assert bit-equality of every
output key between the cached path and a forced-fresh retry.
"""

import json
from pathlib import Path

import numpy as np

import cld2_spark.kernels.detect as D
from cld2_spark.kernels.model import default_model

DATA = Path(__file__).parent / "data"


def _fresh_detect(texts, model, **kw):
    """detect_batch with the retry stream cache disabled at every level."""
    orig = D.detect_batch

    def nocache(ts, model=None, **kwargs):
        kwargs.pop("_stream_cache", None)
        return orig(ts, model, _stream_cache=None, **kwargs)

    D.detect_batch = nocache
    try:
        return nocache(texts, model, **kw)
    finally:
        D.detect_batch = orig


def _assert_equal_outputs(a, b):
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=f"key {k}")


def test_cached_retry_equals_fresh_on_corpus():
    pairs = [json.loads(l) for l in (DATA / "cld2_unittest_pairs.jsonl").open()]
    # long texts force retries; include everything for coverage
    texts = [p["text"] for p in pairs]
    m = default_model()
    _assert_equal_outputs(D.detect_batch(texts, m), _fresh_detect(texts, m))


def test_cached_retry_equals_fresh_on_synth_transcripts():
    from cld2_spark.sources.transcripts import synth_transcripts_pandas
    texts = synth_transcripts_pandas(600)["text"].tolist()
    m = default_model()
    _assert_equal_outputs(D.detect_batch(texts, m), _fresh_detect(texts, m))
    # flags ride through the retry identically
    _assert_equal_outputs(D.detect_batch(texts, m, best_effort=True),
                          _fresh_detect(texts, m, best_effort=True))


def test_squeezed_rows_take_the_fresh_path():
    # a >2KB junk row (squeeze trigger) mixed with normal rows: squeezed
    # text differs from pass 1, so it must NOT reuse the cache -- and the
    # result must still match an all-fresh run
    junk = ("za.jpg zb.jpg " * 200) + "  Dies ist ein ganz normaler deutscher Satz. "
    texts = [junk * 2, "The quick brown fox jumps over the lazy dog again.",
             "Ceci est une phrase en francais pour le test."]
    m = default_model()
    _assert_equal_outputs(D.detect_batch(texts, m), _fresh_detect(texts, m))


def test_subset_norm_batch_equals_fresh_normalize():
    """The retry's NormBatch reuse: a row-subset of a batch's NormBatch is
    bit-identical to normalize_batch of the subset texts (incl. the
    global-leading-space repair when row 0 is dropped)."""
    from cld2_spark.kernels import text as T
    texts = ["Hello world", " leading space", "", "数据 mixed текст",
             "tail ", "a", "  ", "Ωμέγα τέλος", "x" * 100]
    nb = T.normalize_batch(texts)
    rng = np.random.RandomState(3)
    for _ in range(40):
        k = rng.randint(1, len(texts) + 1)
        rows = np.sort(rng.choice(len(texts), size=k, replace=False))
        sub = T.subset_norm_batch(nb, rows)
        fresh = T.normalize_batch([texts[i] for i in rows])
        for f in ("cp", "rid", "u8len", "script", "letter", "lower",
                  "text_bytes", "has_replacement"):
            np.testing.assert_array_equal(
                getattr(sub, f), getattr(fresh, f), err_msg=f"{rows} {f}")
        assert sub.n == fresh.n


def test_best_effort_rescue_stream_cache_equivalence():
    """The analyze-path bestEffort rescue consumes pass 1's exported
    stream cache (incl. the lazily-derived J2 backoff hash from the
    cached buffer); its result must be bit-identical to the fresh
    subset-normalize path."""
    import numpy as np
    from cld2_spark.kernels import text as T
    from cld2_spark.kernels.detect import detect_batch
    from cld2_spark.kernels.model import default_model
    from tests.test_retry_summary import FR

    model = default_model()
    texts = [FR[:120], "short greek row " + "αβγ δεζ ηθι " * 4,
             "the gardens were quiet during the morning hours today",
             "", "café " * 30]
    nb = T.normalize_batch(texts)
    cache: dict = {}
    detect_batch(texts, model, nb=nb, _export_cache=cache)
    rows = np.arange(len(texts))
    a = detect_batch(texts, model, best_effort=True,
                     _stream_cache=(cache, rows))
    b = detect_batch(texts, model, nb=T.subset_norm_batch(nb, rows),
                     best_effort=True)
    for k in ("summary_lang", "summary_pct", "rel1", "is_reliable",
              "lang1", "lang2", "pct1", "pct2"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
