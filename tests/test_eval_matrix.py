"""The per-language P/R/F matrix (BENCH/EVAL_MATRIX.txt, VERDICT r4 #2)
must regenerate deterministically from the checked-in corpus + model; a
kernel or model change that shifts any per-language number fails here
until the matrix is intentionally regenerated."""

from __future__ import annotations

from pathlib import Path

from tools.eval_matrix import build_report

CHECKED_IN = Path(__file__).parent.parent / "BENCH" / "EVAL_MATRIX.txt"


def test_matrix_regenerates_identically():
    fresh = build_report().rstrip("\n")
    frozen = CHECKED_IN.read_text().rstrip("\n")
    assert fresh == frozen, (
        "EVAL_MATRIX.txt drifted from the current kernels/model — "
        "regenerate with: python tools/eval_matrix.py > BENCH/EVAL_MATRIX.txt")


def test_matrix_totals_match_gates():
    """The _Totals_Known rows must agree with the corpus gates: 104/104
    full corpus, >=74% held-out default, >=77% held-out bestEffort."""
    lines = [ln for ln in CHECKED_IN.read_text().splitlines()
             if ln.startswith("_Totals_Known")]
    assert len(lines) == 3
    recalls = [float(ln.split("\t")[-2]) for ln in lines]
    assert recalls[0] == 100.0
    assert recalls[1] >= 74.0
    assert recalls[2] >= 77.0
