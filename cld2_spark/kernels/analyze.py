"""Combined langid + cross-check + perplexity analysis, one pass per batch.

Normalizes the batch once (the expensive shared step) and feeds both the
CLD2-style detector and the trigram cross-check. This is the single kernel
behind the Spark `analyze` pandas UDF and the single-node pandas oracle, so
Spark output and oracle labels agree by construction.
"""

from __future__ import annotations

import numpy as np

from . import text as T
from .crosscheck import crosscheck_batch
from .detect import detect_batch
from .model import Cld2sModel


def analyze_batch(texts: list[str], model: Cld2sModel | None = None,
                  is_plain_text: bool = True) -> dict[str, np.ndarray]:
    if model is None:
        from .model import default_model
        model = default_model()
    if not is_plain_text:
        # S3/S4 pre-pass: tag strip + FULL verbatim entity table (html.py)
        from .html import html_to_text_batch
        texts = html_to_text_batch(texts)
    nb = T.normalize_batch(texts)
    out = detect_batch(texts, model, nb=nb)
    cc = crosscheck_batch(texts, model, nb=nb)
    out["ft_lang"] = cc["ft_lang"]
    out["ppl"] = cc["ppl"]
    out["tri_grams"] = cc["n_grams"]
    return out
