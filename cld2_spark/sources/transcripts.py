"""Deterministic synthetic transcripts (the north-rule input table).

Schema per BASELINE.json input_hint:
  conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  ts:timestamp

Two generators:
  - `synth_transcripts_pandas`: the FIXTURES.md §1 table -- golden-corpus
    snippets cycled through conversations plus injected edge cases (short,
    empty, PII, toxicity, repetitive junk) chosen by pure index arithmetic
    (no RNG -> bit-identical everywhere), plus one "mega" conversation for
    the skew path. Used by parity tests, the oracle, and (replicated) the
    benchmark.
  - `transcripts_view_sql`: a dialect-portable SQL view deriving a
    transcripts-shaped table from the driver's `documents` parquet, so the
    driver can run identical Spark and DuckDB queries over it
    (__spark_entry__ contract).
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta
from pathlib import Path

import pandas as pd

_CORPUS_CACHE: list[str] | None = None

ROLES = ["user", "assistant", "tool"]
TOOLS = [None, "search", "browser", "python", None]

PII_SUFFIX = " contact me: jane.doe@example.com or +1 415-555-2671, ssn 123-45-6789"
TOXIC_SUFFIX = " you absolute smeghead, frakking unbelievable"
JUNK_TEXT = "foo.jpg bar.jpg baz.jpg qux.jpg quux.jpg corge.jpg " * 6
SHORT_TEXT = "ok then"
# reliable English langid but symbol-ratio failure -> drop reason low_quality
# (varied sentences, not a repeated one: the quad repeat-filter + expected-
# score reliability check correctly distrust highly repetitive text)
LOWQ_TEXT = ("this is a perfectly normal english sentence about the weather "
             "and the history of the public baths of the city today. "
             "several visitors remarked that the gardens were quiet during "
             "the morning hours and the fountains had been restored last "
             "spring. the council plans another meeting about the harbour "
             "lights and the new library wing next month. "
             + "#!=" * 150)


def _corpus_texts() -> list[str]:
    global _CORPUS_CACHE
    if _CORPUS_CACHE is None:
        from importlib import resources
        # via the import system, not __file__ (zipimport-safe, see
        # kernels/model.default_model)
        text = (resources.files("cld2_spark") / "model"
                / "corpus.jsonl").read_text()
        _CORPUS_CACHE = [json.loads(line)["text"]
                         for line in text.splitlines() if line]
    return _CORPUS_CACHE


def turn_text(i: int) -> str:
    """Deterministic text for global turn index i (index-arithmetic cases)."""
    corpus = _corpus_texts()
    base = corpus[i % len(corpus)]
    if i % 31 == 0:
        return ""
    if i % 29 == 0:
        return JUNK_TEXT
    if i % 37 == 0:
        return LOWQ_TEXT
    if i % 13 == 0:
        return SHORT_TEXT
    if i % 17 == 0:
        return base + PII_SUFFIX
    if i % 23 == 0:
        return base + TOXIC_SUFFIX
    return base


def synth_transcripts_pandas(n_turns: int = 2000, turns_per_conv: int = 20,
                             mega_turns: int = 0) -> pd.DataFrame:
    """FIXTURES.md §1 transcripts table as pandas (deterministic)."""
    base = datetime(2025, 1, 1)
    rows = []
    for i in range(n_turns):
        conv = i // turns_per_conv
        t = i % turns_per_conv
        rows.append((
            f"c{conv:06d}", t, ROLES[i % 3], turn_text(i), TOOLS[i % 5],
            base + timedelta(hours=conv, seconds=7 * t),
        ))
    for t in range(mega_turns):  # skew: one huge conversation
        rows.append((
            "mega", t, ROLES[t % 3], turn_text(t), TOOLS[t % 5],
            base + timedelta(seconds=7 * t),
        ))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def spark_transcripts(spark, n_turns: int = 2000, turns_per_conv: int = 20,
                      mega_turns: int = 0, n_partitions: int | None = None):
    """The same table as a Spark DataFrame (createDataFrame of the pandas
    frame -- test scale only; the bench generator replicates in Spark)."""
    pdf = synth_transcripts_pandas(n_turns, turns_per_conv, mega_turns)
    df = spark.createDataFrame(pdf)
    if n_partitions:
        df = df.repartition(n_partitions)
    return df


# ------------------------------------------------------------- SQL view ----

def transcripts_view_sql(dialect: str, documents_rel: str = "documents") -> str:
    """Transcripts-shaped view over the driver's `documents` table.

    Pure deterministic column arithmetic (no window functions) so Spark and
    DuckDB produce identical rows: conv = doc_id % 100,
    turn_idx = doc_id / 100, with PII/short/toxic cases injected by modulus.
    """
    if dialect == "spark":
        cast_str = "CAST(doc_id % 100 AS STRING)"
        turn = "CAST(CAST(doc_id / 100 AS BIGINT) AS INT)"
        ts = "timestamp_seconds(1735689600 + doc_id * 7)"
    else:
        cast_str = "CAST(doc_id % 100 AS VARCHAR)"
        turn = "CAST(doc_id // 100 AS INTEGER)"
        ts = "CAST(to_timestamp(1735689600 + doc_id * 7) AS TIMESTAMP)"
    return f"""
SELECT
  'c' || {cast_str} AS conv_id,
  {turn} AS turn_idx,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
  CASE
    WHEN doc_id % 31 = 0 THEN ''
    WHEN doc_id % 13 = 0 THEN '{SHORT_TEXT}'
    WHEN doc_id % 17 = 0 THEN text || '{PII_SUFFIX}'
    WHEN doc_id % 23 = 0 THEN text || '{TOXIC_SUFFIX}'
    ELSE text
  END AS text,
  CASE CAST(doc_id % 5 AS INT) WHEN 1 THEN 'search' WHEN 2 THEN 'browser' WHEN 3 THEN 'python' ELSE NULL END AS tool,
  {ts} AS ts
FROM {documents_rel}
"""


TRANSCRIPT_DDL = ("conv_id string, turn_idx int, role string, text string, "
                  "tool string, ts timestamp")


def read_transcripts(spark, path: str, fmt: str = "parquet"):
    """Schema-enforced batch reader for transcript tables in any of the
    wire formats a large ingestion estate actually carries (S1 source
    scan): parquet (the native layout), jsonl, or headered csv. The schema
    is IMPOSED, never inferred -- inference is a full extra pass at 100TB
    and type drift between files silently corrupts downstream hashing.

    CSV caveat (documented): free text containing quotes/newlines must
    have been written by a quote-escaping writer (Spark's own csv writer
    round-trips; hand-rolled exports may not)."""
    if fmt == "parquet":
        return spark.read.schema(TRANSCRIPT_DDL).parquet(path)
    if fmt in ("json", "jsonl"):
        return (spark.read.schema(TRANSCRIPT_DDL)
                .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
                .json(path))
    if fmt == "csv":
        return (spark.read.schema(TRANSCRIPT_DDL)
                .option("header", True).option("escape", '"')
                .option("multiLine", True)
                .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
                .csv(path))
    raise ValueError(f"unsupported transcript format: {fmt}")
