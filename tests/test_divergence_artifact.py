"""Stock-recipe divergence mechanism artifact (tools/divergence_study.py).

Round 4 proved the framework computes reference-identical gradients and Adam
steps at the reference's stock fine-tune operating point (Adam lr 1e-3,
run_engine.py:23, engine.py:95-99 — tests/test_grad_parity.py), and that the
operating point COLLAPSES on pseudo-NYU at reference scale while lr 3e-5 on
the identical stack closes the domain gap (tests/test_recipe_artifact.py).
This artifact pins the MECHANISM, captured on-chip at the same scale
(72,192x3-sample pseudo-NYU, reference batch geometry, parity-grade evals):

  - per-term gradient attribution over the instrumented stock run
    (steps.combined_term_diag: per-term parameter-gradient norms + cosine
    against the total update direction, every 50 steps for 2 epochs);
  - lr bisection between the known-stable 3e-5 and the diverging 1e-3;
  - single-term ablations at stock lr (the reference loss assembly,
    create_network_and_criterion.py:147-263; the m2d x9 + d2m x500
    projection weighting is multiview_utility.py:101-129);
  - the is_mv curriculum (engine.py:361) pinned always/never on.

The pinned conclusion: the collapse is driven by the MUTUAL-PROJECTION term —
it dominates the total gradient's direction (median cosine ~0.75-0.8; no
other term exceeds ~0.3) with the largest per-term gradient norm, and it is
the ONLY single-term ablation that bends the trajectory back down. The lr
stability boundary on this domain sits below 1e-4 (both bisection points
still degrade), consistent with 3e-5 training to -28.6%.
"""
import json
import os

GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "divergence_study.json"
)


def _load():
    with open(GOLDEN) as f:
        return json.load(f)


def test_captured_at_reference_scale_on_chip():
    art = _load()
    assert art["data"]["samples"] >= 72_000
    assert "TPU" in art["backend"]
    assert art["stock_lr"] == 1e-3
    # every arm starts from the same synthetic-pretrained eval point
    befores = {c["before_mm"] for c in art["collapse"].values()}
    assert len(befores) == 1


def test_mv_projection_dominates_the_update_direction():
    """Gradient attribution: mutual projection is the largest per-term
    gradient AND the only term whose direction matches the total update."""
    d = _load()["diag_summary"]
    terms = [t for t in d if t != "total_grad_norm"]
    mv = d["mv_projection"]
    for t in terms:
        if t == "mv_projection":
            continue
        assert mv["grad_norm_median"] >= d[t]["grad_norm_median"], t
        assert mv["cos_total_median"] >= d[t]["cos_total_median"] + 0.3, t
    assert mv["cos_total_median"] > 0.6
    # and its loss value runs far above every other term (the d2m x500
    # weighting, multiview_utility.py:101-129)
    others = max(
        d[t]["value_median"] for t in terms if t != "mv_projection"
    )
    assert mv["value_median"] > 30 * others


def test_only_the_mv_projection_ablation_recovers():
    """At stock lr every single-term ablation still collapses EXCEPT
    removing mutual projection, which bends the trajectory back down."""
    c = _load()["collapse"]
    before = c["no_mv_projection"]["before_mm"]
    t = c["no_mv_projection"]["trajectory_mm"]
    assert t[-1] < before + 15.0  # shock absorbed, heading back
    assert t[-1] == min(t[1:])    # post-shock minimum is the last eval
    for name in ("no_mv_consistency", "no_prior", "no_collision",
                 "no_bone_length", "stock_instrumented"):
        assert c[name]["collapsed"], name
        assert c[name]["final_mm"] > before + 30.0, name
        assert c[name]["final_mm"] > t[-1] + 20.0, name


def test_lr_stability_boundary_below_1e4():
    """Both bisection points between 3e-5 (stable, recipe artifact) and the
    stock 1e-3 still degrade monotonically — the boundary is under 1e-4."""
    c = _load()["collapse"]
    for name in ("lr_3e-4", "lr_1e-4"):
        t = c[name]["trajectory_mm"]
        assert c[name]["collapsed"], name
        assert all(b >= a - 1.0 for a, b in zip(t, t[1:])), (name, t)


def test_curriculum_is_not_the_cause():
    """Pinning the is_mv curriculum always/never on still collapses at
    stock lr — the window (engine.py:361) neither causes nor prevents it."""
    c = _load()["collapse"]
    for name in ("mv_always", "mv_never"):
        assert c[name]["collapsed"], name
