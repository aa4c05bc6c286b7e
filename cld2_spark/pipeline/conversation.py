"""Conversation-level features via grouped-map pandas UDF.

The per-turn pipeline is row-local; conversation-level rules are the one
place the north-rule pipeline needs a grouped computation (SURVEY.md §2.10:
"a grouped-map UDF is used only for conversation-level quality rules").

`conversation_features` demonstrates the scalable shape:
  groupBy(conv_id).applyInPandas -- one shuffle on conv_id, Arrow-batched
  per-group pandas, no per-row Python. Skewed mega-conversations are safe
  because the computation is O(group) with tiny state; for conversation
  aggregates that decompose, prefer plain groupBy().agg (map-side partials).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURES_DDL = ("conv_id string, n_turns int, n_user_turns int, "
                "total_chars bigint, mean_gap_s double, max_gap_s double")


def conversation_features(df: DataFrame) -> DataFrame:
    """Per-conversation stats that need within-group ordering (turn gaps)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx")
        ts = pdf["ts"].astype("int64").to_numpy() / 1e9
        gaps = np.diff(ts) if len(ts) > 1 else np.zeros(0)
        return pd.DataFrame({
            "conv_id": [pdf["conv_id"].iloc[0]],
            "n_turns": np.int32(len(pdf)),
            "n_user_turns": np.int32((pdf["role"] == "user").sum()),
            "total_chars": np.int64(pdf["text"].fillna("").str.len().sum()),
            "mean_gap_s": float(np.round(gaps.mean(), 3)) if len(gaps) else 0.0,
            "max_gap_s": float(np.round(gaps.max(), 3)) if len(gaps) else 0.0,
        })

    return df.groupBy("conv_id").applyInPandas(fn, schema=FEATURES_DDL)
