"""Self-supervision evidence artifacts (tools/selfsup_demo.py, run on TPU).

The demo adapts the shipped synthetic pretraining to a sensor-shifted
pseudo-NYU domain with the engine's combined loop — no ground-truth joints in
any loss — and records before/after joint error; the --no_mv ablation reruns
it with the multi-view terms disabled to isolate their contribution.
"""
import json
import os

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return json.load(f)


def test_selfsup_adaptation_improves_accuracy():
    art = _load("selfsup_demo.json")
    assert "TPU" in art["backend"]
    assert art["adapt"] == "combined" and not art.get("no_mv", False)
    # material improvement, self-supervised only (GT never enters a loss)
    assert art["after_mm"] < art["before_mm"] - 3.0, art
    assert art["after_raw_mm"] < art["before_raw_mm"] - 3.0, art


def test_multiview_terms_drive_the_improvement():
    """The --no_mv ablation (same data, same steps, multi-view projection +
    consistency off) must gain materially less than the full loop."""
    art = _load("selfsup_demo.json")
    abl = _load("selfsup_ablation.json")
    assert abl["no_mv"] and abl["samples"] == art["samples"]
    gain_full = art["before_mm"] - art["after_mm"]
    gain_abl = abl["before_mm"] - abl["after_mm"]
    assert gain_full > gain_abl + 2.0, (gain_full, gain_abl)
