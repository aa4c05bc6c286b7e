"""Heuristic quality rules (Gopher/C4-style), engine-portable.

One set of named thresholds; three consumers:
  - Spark pipeline: `low_quality_sql('spark')` rendered into `F.expr(...)`
    columns -- pure whole-stage-codegen SQL, no UDF (SURVEY.md §2.11
    "heuristic quality rules -> pure Spark SQL").
  - DuckDB oracle SQL for the driver correctness gate.
  - pandas reference implementation (oracle labels, FIXTURES.md §4).

All comparisons are integer cross-multiplications (no float ratios) and all
character classes are explicit ASCII ranges (Java regex, RE2 and Python re
disagree on Unicode-awareness of \\w and friends), so the three engines
agree bit-for-bit.
"""

from __future__ import annotations

# thresholds (per conversation turn, not per web document)
MIN_CHARS = 8            # shorter -> drop reason 'too_short'
MAX_CHARS = 100_000
MAX_WORDS = 50_000
MAX_MEAN_WORD_LEN = 25   # alpha_chars > words * 25  -> low_quality

# ASCII punctuation ranges: !-/ :-@ [-` {-~  (non-ASCII letters NOT counted)
_SYMBOL = "[!-/:-@\\[-`{-~]"
_DIGIT = "[0-9]"
_ALPHA = "[A-Za-z]"


_SYMBOL_CHARS = "".join(chr(c) for c in list(range(0x21, 0x30)) + list(range(0x3A, 0x41))
                        + list(range(0x5B, 0x61)) + list(range(0x7B, 0x7F)))
_DIGIT_CHARS = "0123456789"
_ALPHA_CHARS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_CHARSETS = {_SYMBOL: _SYMBOL_CHARS, _DIGIT: _DIGIT_CHARS, _ALPHA: _ALPHA_CHARS}


def _count(col: str, pat: str, dialect: str) -> str:
    """SQL expression counting chars of a 1-char class in col.

    Spark renders it as `translate` (table-driven char removal, much faster
    than the regex engine in the hot path); DuckDB keeps the equivalent
    regexp_replace -- identical counts, so the oracle compare still holds."""
    if dialect == "spark":
        chars = _CHARSETS[pat].replace("\\", "\\\\").replace("'", "\\'")
        return f"(length({col}) - length(translate({col}, '{chars}', '')))"
    g = ", 'g'"
    return f"(length({col}) - length(regexp_replace({col}, '{pat}', ''{g})))"


def features_sql(col: str, dialect: str) -> dict[str, str]:
    """Named feature expressions over a text column."""
    if dialect == "spark":
        n_words = (f"(case when length(trim({col})) = 0 then 0 "
                   f"else size(split(trim({col}), '\\\\s+')) end)")
    else:
        n_words = (f"(case when length(trim({col})) = 0 then 0 "
                   f"else length(string_split_regex(trim({col}), '\\s+')) end)")
    return {
        "n_chars": f"length({col})",
        "n_words": n_words,
        "n_symbols": _count(col, _SYMBOL, dialect),
        "n_digits": _count(col, _DIGIT, dialect),
        "n_alpha": _count(col, _ALPHA, dialect),
    }


def low_quality_sql(col: str, dialect: str) -> str:
    """Boolean SQL expression: True when the turn fails the heuristic rules."""
    f = features_sql(col, dialect)
    return (
        f"(({f['n_chars']} > {MAX_CHARS})"
        f" or ({f['n_words']} > {MAX_WORDS})"
        f" or ({f['n_alpha']} > {f['n_words']} * {MAX_MEAN_WORD_LEN})"
        f" or ({f['n_symbols']} * 2 > {f['n_chars']})"
        f" or ({f['n_digits']} * 2 > {f['n_chars']}))"
    )


def too_short_sql(col: str, dialect: str) -> str:
    return f"(length({col}) < {MIN_CHARS})"


# ---------------------------------------------------------------- pandas ----

def features_pandas(s):
    """Same features over a pandas Series (oracle path).

    Whitespace semantics must match the SQL engines exactly: Spark `trim`
    and DuckDB `trim` strip only ' ' (0x20), and Java/RE2 `\\s` is the ASCII
    class -- while Python's `\\s` and `str.strip()` are Unicode-aware
    (U+202F/U+3000/NBSP). Use explicit ASCII sets on the pandas side."""
    t = s.fillna("")
    n_chars = t.str.len()
    trimmed = t.str.strip(" ")
    n_words = (trimmed.str.split("[ \t\n\x0b\f\r]+", regex=True).str.len()
               .where(trimmed.str.len() > 0, 0))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_symbols": t.str.count(_SYMBOL),
        "n_digits": t.str.count(_DIGIT),
        "n_alpha": t.str.count(_ALPHA),
    }


def low_quality_pandas(s):
    f = features_pandas(s)
    return (
        (f["n_chars"] > MAX_CHARS)
        | (f["n_words"] > MAX_WORDS)
        | (f["n_alpha"] > f["n_words"] * MAX_MEAN_WORD_LEN)
        | (f["n_symbols"] * 2 > f["n_chars"])
        | (f["n_digits"] * 2 > f["n_chars"])
    )


def too_short_pandas(s):
    return s.fillna("").str.len() < MIN_CHARS
