"""S4 full entity table (VERDICT r2 #8) and F7 simple-lowercase parity
(VERDICT r2 #9).

Lowercase golden cases were produced by COMPILING the reference's own
utf8repl_lettermarklower table with UTF8GenericReplace and probing it:
the table implements Unicode SIMPLE (1:1) lowercase -- I-with-dot -> i,
but the SpecialCasing full-expansion cases (fi-ligature, 'n, Greek iota
combos, eszett) stay unchanged.
"""

import random

from cld2_spark.kernels.html import (expand_entities, full_entity_table,
                                     html_to_text_batch)


def test_full_entity_table_shape():
    tbl = full_entity_table()
    assert len(tbl) == 265                    # kNameToEntitySize
    assert tbl["AElig"] == "Æ"
    assert tbl["AMP"] == "&" and tbl["amp"] == "&"   # case-sensitive pair


def test_entity_roundtrip_50_random_entries():
    """VERDICT r2 #8 'Done': 50 random table entries round-trip through
    the kernel-side expansion."""
    tbl = full_entity_table()
    rng = random.Random(42)
    names = rng.sample(sorted(tbl), 50)
    text = " ".join(f"&{n};" for n in names)
    want = " ".join(tbl[n] for n in names)
    assert expand_entities(text) == want


def test_entity_numeric_and_unknown():
    assert expand_entities("&#233;t&#xE9;") == "été"
    assert expand_entities("&notanentity; & &#999999999;") == \
        "&notanentity; & &#999999999;"


def test_html_to_text_batch():
    out = html_to_text_batch(
        ["<p>caf&eacute; <b>noir</b></p><script>var x=1;</script>",
         "plain text"])
    assert "café" in out[0] and "noir" in out[0]
    assert "var x" not in out[0] and "<" not in out[0]
    assert out[1] == "plain text"


def test_comment_containing_double_dash_fully_stripped():
    """ADVICE r3: a comment whose body contains '--' and '>' must vanish
    entirely -- the old ([^-]|-[^-])* form couldn't match it, and the
    generic <[^>]*> rule then leaked the comment tail into the text."""
    out = html_to_text_batch(
        ["<p>keep</p><!-- leaked -- tail > body --><p>end</p>"])
    assert "leaked" not in out[0] and "tail" not in out[0]
    assert "keep" in out[0] and "end" in out[0]


def test_detect_html_mode_finds_language():
    from cld2_spark.kernels.detect import detect_batch
    from tests.test_retry_summary import FR
    html = ("<html><body><!-- c --><p>"
            + FR.replace("é", "&eacute;").replace("è", "&egrave;")
            + "</p><script>var x=1;</script></body></html>")
    r = detect_batch([html], is_plain_text=False)
    assert r["summary_lang"][0] == "fr"
    # and the same text through the plain path scores identically
    plain = detect_batch([FR])
    assert plain["summary_lang"][0] == "fr"


def test_simple_lowercase_parity_with_reference_table():
    """Golden cases probed from the compiled reference table (see module
    docstring): simple lowercase only."""
    from cld2_spark.kernels import unicode_tables as ut
    _, _, lower = ut.tables()

    def low(ch: str) -> str:
        return chr(int(lower[ord(ch)]))

    assert low("İ") == "i"        # Turkish I-with-dot -> plain i
    assert low("ı") == "ı"   # dotless i unchanged
    assert low("I") == "i"
    assert low("Σ") == "σ"   # Sigma -> sigma
    assert low("ς") == "ς"   # final sigma NOT folded (reference)
    assert low("ß") == "ß"   # eszett unchanged
    assert low("ẞ") == "ß"   # capital eszett -> eszett
    assert low("Ǆ") == "ǆ"   # DZ-caron -> dz-caron
    assert low("ǅ") == "ǆ"   # Dz-caron -> dz-caron
    assert low("ᾈ") == "ᾀ"   # Alpha+iota combo, simple 1:1
    assert low("ﬁ") == "ﬁ"   # fi ligature unchanged
    assert low("ŉ") == "ŉ"   # 'n unchanged
    assert low("ΐ") == "ΐ"   # iota-dialytika-tonos unchanged
