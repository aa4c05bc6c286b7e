"""J8 hint semantics: hints bias, never force (public/compact_lang_det.h:133-138).

A hint toward a statistically-close sibling (hr <-> bs) redirects the
verdict via the close-set whack (AddCloseLangWhack), because close pairs
share most quadgram evidence; a hint toward an unrelated language must not
flip clear text.
"""

import json
from pathlib import Path

from cld2_spark.kernels.detect import detect_batch

DATA = Path(__file__).parent / "data"

CLEAR_EN = ("government officials said on wednesday that the new public "
            "library would open to all members of the community next year "
            "after several months of construction and planning work")


def _corpus_text(case_id: str) -> str:
    for line in (DATA / "cld2_unittest_pairs.jsonl").open():
        p = json.loads(line)
        if p["case_id"] == case_id:
            return p["text"]
    raise KeyError(case_id)


def test_hint_redirects_within_close_set():
    hr = _corpus_text("hr_Latn")
    assert detect_batch([hr])["lang1"][0] == "hr"
    assert detect_batch([hr], lang_hints=["bs"])["lang1"][0] == "bs"
    assert detect_batch([hr], lang_hints=["hr"])["lang1"][0] == "hr"
    bs = _corpus_text("bs_Latn")
    assert detect_batch([bs], lang_hints=["hr"])["lang1"][0] == "hr"


def test_hint_never_forces_clear_text():
    res = detect_batch([CLEAR_EN], lang_hints=["fr"])
    assert res["lang1"][0] == "en"


def test_unknown_hint_code_is_ignored():
    a = detect_batch([CLEAR_EN], lang_hints=["zz-bogus"])
    b = detect_batch([CLEAR_EN])
    assert a["lang1"][0] == b["lang1"][0]
    assert a["pct1"][0] == b["pct1"][0]


def test_hint_udf_roundtrip(spark):
    from pyspark.sql import functions as F
    from cld2_spark.functions.langid import detect_summary_hinted_udf
    hr = _corpus_text("hr_Latn")
    df = spark.createDataFrame([(hr, "bs"), (CLEAR_EN, "fr"), (CLEAR_EN, None)],
                               "text string, hint string")
    out = (df.withColumn("ld", detect_summary_hinted_udf(F.col("text"), F.col("hint")))
           .select(F.col("ld.lang1").alias("lang1")).toPandas())
    assert out.lang1.tolist() == ["bs", "en", "en"]
