"""HTML tag stripping + entity expansion (S3/S4), engine-portable SQL.

The reference handles HTML inside its scanner (`is_plain_text=false`):
tags and <script>/<style> bodies are skipped (ScriptScanner,
internal/getonescriptspan.cc:679-794) and entities expand to their UTF-8
chars (ReadEntity/EntityToBuffer, :393-469, table
internal/generated_entities.cc). The Spark-first equivalent is a PRE-
projection: one chain of regexp_replace expressions that runs whole-stage-
codegen on the JVM, rendered identically for DuckDB so the driver oracle
can compare bit-for-bit. Transcripts are plain text per the input hint, so
this stage is opt-in (`is_plain_text=False` surfaces).

Covered: comments, <script>/<style> bodies, all tags, decimal + hex
numeric entities (via char repertoire below), and the frequent named
entities. Per the reference, tags become a space (word boundary), entities
become their character. The long tail of the reference's 2,000-entry named
entity table is deliberately not replicated (rare in web text; unknown
entities are left verbatim exactly like an unrecognized `&foo` is).
"""

from __future__ import annotations

# the frequent named entities (reference table: internal/generated_entities.cc)
NAMED_ENTITIES: list[tuple[str, str]] = [
    ("amp", "&"), ("lt", "<"), ("gt", ">"), ("quot", '"'), ("apos", "'"),
    ("nbsp", " "), ("copy", "©"), ("reg", "®"), ("deg", "°"),
    ("hellip", "…"), ("mdash", "—"), ("ndash", "–"),
    ("lsquo", "‘"), ("rsquo", "’"), ("ldquo", "“"),
    ("rdquo", "”"), ("eacute", "é"), ("egrave", "è"),
    ("agrave", "à"), ("ccedil", "ç"), ("uuml", "ü"),
    ("ouml", "ö"), ("auml", "ä"), ("szlig", "ß"),
    ("ntilde", "ñ"), ("aacute", "á"), ("iacute", "í"),
    ("oacute", "ó"), ("uacute", "ú"), ("middot", "·"),
]

# numeric entity repertoire: SQL has no codepoint constructor common to
# both engines, so the chain expands the numerics that actually occur in
# web text (quote/dash/space family + frequent Latin-1); each adds two
# regexp_replace links, so the list stays deliberately short
_NUMERIC_RANGE = [0x22, 0x27, 0x26, 0xA0, 0xE9, 0xE8, 0xFC, 0xF6, 0xE4,
                  0x2018, 0x2019, 0x201C, 0x201D, 0x2013, 0x2014, 0x2026]


def _lit(s: str) -> str:
    return s.replace("'", "''")


def strip_html_sql(col: str, dialect: str) -> str:
    """Render the tag-strip + entity-expand chain for `dialect`."""
    g = ", 'g'" if dialect == "duckdb" else ""

    def rr(expr: str, pat: str, rep: str) -> str:
        p = _lit(pat)
        if dialect == "spark":
            p = p.replace("\\", "\\\\")
        return f"regexp_replace({expr}, '{p}', '{_lit(rep)}'{g})"

    expr = col
    # comments and script/style bodies first (their content must vanish)
    expr = rr(expr, r"<!--([^-]|-[^-])*-->", " ")
    expr = rr(expr, r"(?is)<script[^>]*>.*?</script>", " ")
    expr = rr(expr, r"(?is)<style[^>]*>.*?</style>", " ")
    # any remaining tag -> single space (word boundary, like the scanner)
    expr = rr(expr, r"<[^>]*>", " ")
    # numeric entities for the supported repertoire
    for cp in _NUMERIC_RANGE:
        ch = chr(cp)
        expr = rr(expr, rf"&#{cp};", ch)
        expr = rr(expr, rf"&#[xX]0*{cp:x};", ch)
    # named entities; &amp; LAST so it cannot create new entities
    for name, ch in NAMED_ENTITIES:
        if name == "amp":
            continue
        expr = rr(expr, rf"&{name};", ch)
    expr = rr(expr, r"&amp;", "&")
    # collapse runs of spaces introduced by tag removal
    expr = rr(expr, r"  +", " ")
    return expr


def strip_html_pandas(s):
    """Same chain over a pandas Series (oracle-of-the-oracle for tests)."""
    import re

    out = s.fillna("")
    out = out.str.replace(r"<!--([^-]|-[^-])*-->", " ", regex=True)
    out = out.str.replace(r"(?is)<script[^>]*>.*?</script>", " ", regex=True)
    out = out.str.replace(r"(?is)<style[^>]*>.*?</style>", " ", regex=True)
    out = out.str.replace(r"<[^>]*>", " ", regex=True)
    for cp in _NUMERIC_RANGE:
        out = out.str.replace(rf"&#{cp};", chr(cp), regex=True)
        out = out.str.replace(re.compile(rf"&#[xX]0*{cp:x};"), chr(cp), regex=True)
    for name, ch in NAMED_ENTITIES:
        if name == "amp":
            continue
        out = out.str.replace(rf"&{name};", ch, regex=True)
    out = out.str.replace(r"&amp;", "&", regex=True)
    out = out.str.replace(r"  +", " ", regex=True)
    return out
