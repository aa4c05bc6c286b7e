"""bench.py output contract: the driver records `python bench.py`'s last
stdout line as BENCH_r{N}.json, so a broken bench silently costs the
round's performance artifact. This smoke runs the real script (scaling
phase disabled, tiny input) and validates the JSON shape."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_emits_contract_json():
    env = dict(os.environ,
               CLD2S_SCALING="0",
               CLD2S_BENCH_REPLICATE="2",
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_CPUS="4")
    out = subprocess.run([sys.executable, str(REPO / "bench.py")],
                         capture_output=True, text=True, timeout=600,
                         env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["metric"] == "keep_drop_pipeline_sec"
    assert d["value"] > 0 and d["unit"] == "sec"
    assert d["turns_per_sec"] > 0 and d["n_turns"] > 0
    for q in ("keep_drop_pipeline", "scrub_pii", "quality_flags",
              "conv_rollup", "pricing_summary", "dedup_exact",
              "minhash_pairs", "token_stats", "ann_cosine"):
        assert q in d["queries"] and d["queries"][q] > 0
