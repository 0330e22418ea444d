"""Pins the on-chip eval-precision artifact (tools/measure_wobble.py).

TPU's default f32 convs run bf16 passes, and XLA compiles different layouts
per batch size, so the SAME crop yields different joints depending on which
program processed it. The parity-grade mode (``precision="highest"``,
``cfg.eval_precision="highest"``, the tools/parity_eval.py default) forces
true-f32 passes. The artifact captures both modes on the real chip:
per-sample |joints(B=1024 program) - joints(B=128 program)| over 1024
rendered crops with the shipped pretrained params.

Reference semantics at stake: eval as a deterministic function of the crop
(network/engine.py:203-207); the 0.5 mm NYU parity bar (BASELINE.md) is
only adjudicable through the batch-invariant mode.
"""
import json
import os

import pytest


def test_precision_wobble_artifact():
    path = os.path.join(
        os.path.dirname(__file__), "goldens", "precision_wobble.json"
    )
    if not os.path.exists(path):
        pytest.skip("on-chip artifact not captured")
    with open(path) as f:
        art = json.load(f)
    assert "TPU" in art["backend"]
    # The default mode's wobble is real and documented (infer.py): large
    # enough to swamp a 0.5 mm parity comparison.
    assert art["default"]["max_mm"] > 0.5
    # The parity mode is batch-invariant far below the 0.5 mm bar —
    # micrometer-level differences only.
    assert art["highest"]["max_mm"] < 0.01
    assert art["highest"]["p99_mm"] < 0.001
    # The measured cost of parity mode (scan-timed device forwards): the
    # pipeline is NOT conv-bound at B=128, so "highest" is nowhere near the
    # naive ~3x conv-FLOP multiplier there (docs reconciled in round 5).
    if "highest_cost_ratio_b128" in art:
        assert 1.0 <= art["highest_cost_ratio_b128"] < 1.5
        assert 1.0 <= art["highest_cost_ratio_b1024"] < 2.5
