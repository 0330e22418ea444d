"""Reference-recipe-at-scale evidence artifact (tools/recipe_artifact.py).

Two tools/reference_recipe.py runs on the SAME 72,192x3-sample pseudo-NYU
split at the reference batch geometry and curriculum, both starting from
the shipped synthetic pretraining (the reference README's documented
self-supervised fine-tune):

  stock      Adam lr 1e-3, StepLR /10 per 25, 75 epochs (run_engine.py:23,
             engine.py:95-99) — diverges on pseudo-NYU (~49.9 -> 90+ mm).
  companion  identical stack at lr 3e-5 — closes the domain gap.

tests/test_grad_parity.py pins WHY the stock divergence cannot be a
framework defect (reference-identical gradients + optimizer step); this
artifact pins the trajectories themselves. GT joints never enter a loss in
either run (metric only).
"""
import json
import os

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load():
    with open(os.path.join(GOLDEN_DIR, "recipe_at_scale.json")) as f:
        return json.load(f)


def test_runs_share_scale_and_init():
    art = _load()
    for run in (art["stock"], art["companion"]):
        before = run["trajectory"][0]
        assert before["epoch"] == -1
        # both start from the same synthetic-pretrained eval point
        assert abs(before["mm"] - art["stock"]["trajectory"][0]["mm"]) < 1e-6
    assert art["companion"]["samples"] >= 72_000


def test_companion_closes_domain_gap_at_reference_scale():
    art = _load()
    run = art["companion"]
    assert run["finished"]
    traj = run["trajectory"]
    before = traj[0]["mm"]
    best = min(e["mm"] for e in traj[1:])
    final = traj[-1]["mm"]
    assert best < before - 10.0, (before, best)       # >= 10 mm gained
    assert final < before - 7.0, (before, final)      # and it holds
    # stable: no post-warmup eval blows past the init error
    assert max(e["mm"] for e in traj[1:]) < before + 5.0


def test_stock_operating_point_diverges_on_pseudo_nyu():
    """The documented divergence this artifact exists to pin: the stock
    lr-1e-3 point degrades the pretrained model at reference scale, and
    neither StepLR decade rescues it."""
    art = _load()
    traj = art["stock"]["trajectory"]
    before = traj[0]["mm"]
    after_warmup = [e for e in traj if e["epoch"] >= 3]
    assert len(after_warmup) >= 30
    assert min(e["mm"] for e in after_warmup) > before + 20.0
    # the lr 1e-4 phase exists in the record and does not recover
    lr2 = [e for e in traj if 1e-5 < e["lr"] < 1e-3]
    assert lr2 and min(e["mm"] for e in lr2) > before + 20.0
