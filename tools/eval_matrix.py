"""Per-language precision/recall/F evaluation matrix (VERDICT r4 #2).

Mirrors the reference's published evaluation format
(`/root/reference/docs/evaluate_cld2_small_20140122.txt`): one row per
language with top-5 confusion breakdowns for precision (what the truth
was among detections of L) and recall (what was detected among actual-L
cases, `xx*` marking unreliable detections), N.det / N.act counts, and a
`_Totals_Known` micro-average row — making the accuracy gap vs the
reference auditable language-by-language instead of as a single
aggregate.

Three matrices over the bundled unittest corpus
(`tests/data/cld2_unittest_pairs.jsonl`, the reference's kTestPair set):
  1. full corpus texts, default flags  (the 104/104 gate's set)
  2. held-out second halves, default   (the 77/104 gate's set)
  3. held-out second halves, bestEffort (the 81/104 gate's set)

Deterministic: pure function of the checked-in corpus + model.
Regenerate with `python tools/eval_matrix.py > BENCH/EVAL_MATRIX.txt`;
`tests/test_eval_matrix.py` re-derives it and diffs against the
checked-in file each CI run.
"""

from __future__ import annotations

import json
import sys
from collections import Counter, defaultdict
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PAIRS = REPO / "tests" / "data" / "cld2_unittest_pairs.jsonl"


def _scored_pairs() -> list[dict]:
    pairs = [json.loads(line) for line in PAIRS.open()]
    return [p for p in pairs
            if p["category"] not in ("bad_utf8", "version_canary")]


def _dominant_script(text: str) -> str:
    from cld2_spark.kernels.unicode_tables import (SCRIPTS, codepoints_of,
                                                   tables)
    script, letter, _ = tables()
    cps = codepoints_of(text)
    cps = cps[cps < len(script)]
    sids = script[cps][letter[cps].astype(bool)]
    sids = sids[sids != 0]  # drop Common
    if not len(sids):
        return "Zyyy"
    return SCRIPTS[int(np.bincount(sids).argmax())][0]


def _breakdown(counter: Counter, total: int) -> str:
    parts = [f"{lang}_{100.0 * c / total:.2f}"
             for lang, c in counter.most_common(5)]
    return " ".join(parts)


def _matrix(cases: list[tuple[str, str, str, bool]]) -> list[str]:
    """cases: (expected, detected, script, is_reliable). Returns the
    formatted rows + _Totals_Known line (reference column layout)."""
    by_actual: dict[str, Counter] = defaultdict(Counter)   # recall side
    by_detected: dict[str, Counter] = defaultdict(Counter)  # precision side
    scripts: dict[str, str] = {}
    for want, got, script, reliable in cases:
        got_marked = got if reliable else f"{got}*"
        by_actual[want][got_marked] += 1
        by_detected[got][want] += 1
        scripts.setdefault(want, script)

    lines = [" Language\t\tPrecision\t\t\tRecall\t\t\tF-measure",
             " Code\tScript\tTop five\tN.det\t%\tTop five\tN.act\t%"
             "\tfraction\tCode"]
    tot_det = tot_act = tot_det_ok = tot_act_ok = 0
    for lang in sorted(by_actual):
        n_act = sum(by_actual[lang].values())
        act_ok = sum(c for g, c in by_actual[lang].items()
                     if g.rstrip("*") == lang)
        n_det = sum(by_detected[lang].values())
        det_ok = by_detected[lang].get(lang, 0)
        prec = 100.0 * det_ok / n_det if n_det else 0.0
        rec = 100.0 * act_ok / n_act if n_act else 0.0
        f = (2 * prec * rec / (prec + rec) / 100.0
             if prec + rec else 0.0)
        lines.append(
            f"{lang}\t{scripts[lang]}\t"
            f"{_breakdown(by_detected[lang], n_det) if n_det else '-'}\t"
            f"{n_det}\t{prec:.2f}\t"
            f"{_breakdown(by_actual[lang], n_act)}\t"
            f"{n_act}\t{rec:.2f}\t{f:.4f}\t{lang}")
        tot_det += n_det
        tot_act += n_act
        tot_det_ok += det_ok
        tot_act_ok += act_ok
    # detections whose label never occurs as truth (e.g. 'un') — count
    # them into the totals' precision denominator like the reference's
    # _Unknown rows sit outside _Totals_Known
    p = 100.0 * tot_det_ok / tot_det if tot_det else 0.0
    r = 100.0 * tot_act_ok / tot_act if tot_act else 0.0
    f = 2 * p * r / (p + r) / 100.0 if p + r else 0.0
    lines.append(f"_Totals_Known {len(by_actual)}\t\t\t{tot_det}\t{p:.2f}"
                 f"\t\t{tot_act}\t{r:.2f}\t{f:.4f}")
    return lines


def build_report() -> str:
    from cld2_spark.kernels.detect import detect_batch

    pairs = _scored_pairs()
    texts = [p["text"] for p in pairs]
    halves = [p["text"][len(p["text"]) // 2:] for p in pairs]
    wants = [p["expected_lang"] for p in pairs]
    scripts = [_dominant_script(t) for t in texts]

    sections = []
    for title, batch_texts, kw in (
            ("full corpus, default flags", texts, {}),
            ("held-out second halves, default flags", halves, {}),
            ("held-out second halves, bestEffort", halves,
             {"best_effort": True})):
        res = detect_batch(batch_texts, **kw)
        cases = [(wants[i], str(res["summary_lang"][i]), scripts[i],
                  bool(res["is_reliable"][i])) for i in range(len(pairs))]
        sections.append(f"== Evaluate cld2_spark: {title} "
                        f"({len(cases)} cases) ==")
        sections.extend(_matrix(cases))
        sections.append("")
    head = ("# Per-language P/R/F matrix, format mirroring the reference's"
            " docs/evaluate_cld2_small_20140122.txt\n"
            "# (xx* in a Recall breakdown = detected as xx but"
            " unreliable). One deviation, disclosed:\n"
            "# the reference matrix denies recall credit to unreliable"
            " detections; here a correct-but-\n"
            "# unreliable answer COUNTS (matching our gates and the"
            " reference's own unit test, which\n"
            "# compare the summary language only) — the * annotations"
            " keep the reliability auditable.\n"
            "# Regenerate:\n"
            "#   python tools/eval_matrix.py > BENCH/EVAL_MATRIX.txt\n")
    return head + "\n".join(sections)


if __name__ == "__main__":
    print(build_report())
