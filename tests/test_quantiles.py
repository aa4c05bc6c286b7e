"""Quantile operator: exact path matches numpy interpolation; approx path
(the production default) honors the Greenwald-Khanna rank-error bound
vs the exact result on real sf0.1 data (VERDICT r4 item #6)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from cld2_spark.operators.quantiles import grouped_quantiles

SF_DIR = "/root/testdata/sf0.1"
PROBS = (0.5, 0.9, 0.99)
ACCURACY = 10000


def test_exact_matches_numpy(spark):
    pdf = pd.DataFrame({
        "k": ["a"] * 101 + ["b"] * 51,
        "v": list(np.linspace(0.0, 100.0, 101)) + list(np.linspace(-5, 5, 51)),
    })
    out = (grouped_quantiles(spark.createDataFrame(pdf), ["k"], "v",
                             probs=PROBS, exact=True, round_digits=None)
           .toPandas().set_index("k"))
    for k, grp in pdf.groupby("k"):
        for p, col in zip(PROBS, ("p50", "p90", "p99")):
            want = np.quantile(grp["v"].to_numpy(), p)  # linear interp
            assert out.loc[k, col] == pytest.approx(want, abs=1e-9)
        assert out.loc[k, "n"] == len(grp)


def test_approx_rank_error_bound_sf01(spark):
    """Every approx pXX lands within the GK guarantee: its true rank in
    the group is within n/accuracy of the target rank."""
    if not Path(SF_DIR).exists():
        pytest.skip("sf0.1 testdata not present")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    approx = (grouped_quantiles(ev, ["event_type"], "value", probs=PROBS,
                                exact=False, accuracy=ACCURACY,
                                round_digits=None)
              .toPandas().set_index("event_type"))
    vals = ev.select("event_type", "value").toPandas()
    for etype, grp in vals.groupby("event_type"):
        v = np.sort(grp["value"].to_numpy())
        n = len(v)
        # GK guarantee: the returned ELEMENT's rank is within ceil(n/acc)
        # of the target; +2 covers the rank-convention ambiguity (p*(n-1)
        # vs p*n) and searchsorted tie-side
        eps_ranks = int(np.ceil(n / ACCURACY)) + 2
        for p, col in zip(PROBS, ("p50", "p90", "p99")):
            got = approx.loc[etype, col]
            rank = np.searchsorted(v, got, side="left")
            target = p * (n - 1)
            assert abs(rank - target) <= eps_ranks, (
                f"{etype} {col}: rank {rank} vs target {target:.1f} "
                f"(n={n}, eps={eps_ranks})")
        assert approx.loc[etype, "n"] == n


def test_approx_plan_is_partial_aggregated(spark):
    """The scale path must partial-aggregate map-side: two HashAggregate
    nodes around ONE exchange, no sort-based object aggregate buffering
    raw values."""
    ev = spark.range(1000).selectExpr("id % 7 AS k", "CAST(id AS DOUBLE) AS v")
    plan = (grouped_quantiles(ev, ["k"], "v", exact=False)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1
    assert "partial_approx_percentile" in plan or "partial" in plan
