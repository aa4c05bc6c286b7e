"""J8 hint semantics: hints bias, never force (public/compact_lang_det.h:133-138)."""

import numpy as np

from cld2_spark.kernels.detect import detect_batch


# genuinely ambiguous Bosnian/Croatian-ish text (close set) -- short, so a
# hint vote per chunk can tip it; and clear English the hint must not flip
AMBIG = "ja sam bio u gradu danas i kupio sam novine za svoju obitelj"
CLEAR_EN = ("government officials said on wednesday that the new public "
            "library would open to all members of the community next year "
            "after several months of construction and planning work")


def test_hint_biases_ambiguous_text():
    base = detect_batch([AMBIG])
    hinted = {}
    for h in ("hr", "bs"):
        hinted[h] = detect_batch([AMBIG], lang_hints=[h])
    # with an explicit hint toward either close-pair member, the result
    # follows the hint (the unhinted result equals one of them)
    assert hinted["hr"]["lang1"][0] == "hr"
    assert hinted["bs"]["lang1"][0] == "bs"
    assert base["lang1"][0] in ("hr", "bs", "sr")


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
    df = spark.createDataFrame([(AMBIG, "bs"), (CLEAR_EN, "fr"), (CLEAR_EN, None)],
                               "text string, hint string")
    out = (df.withColumn("ld", detect_summary_hinted_udf(F.col("text"), F.col("hint")))
           .select(F.col("ld.lang1").alias("lang1")).toPandas())
    assert out.lang1.tolist() == ["bs", "en", "en"]
