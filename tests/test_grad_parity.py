"""End-to-end gradient + optimizer-step parity vs the reference torch stack.

Golden provenance: ``tools/grad_parity_ab.py`` builds the reference
HeatmapEstimationNetwork + MultiTaskLoss (network/
create_network_and_criterion.py:27-135,147-263) at a torch-seeded random
init, feeds it the SAME combined batch as our stack, and records the loss
terms, per-parameter gradients (norms + slices) and the post-Adam(lr=1e-3,
wd=1e-5) parameters. This test rebuilds the JAX side from the committed
init weights and seeds and asserts agreement within f32 rounding.

Why the tolerances are what they are: the generating tool also runs a
float64 cross-check — jax-f64 sits 5.8e-5 (rel) from the torch-f64 oracle
while torch-f32's own rounding error vs that oracle is 3.3e-3, i.e. the two
stacks compute the same mathematical gradient and ALL observed f32
deviation (max 3.8e-2 rel-norm across 146 tensors) is accumulation-order
rounding. This is the evidence that training-dynamics differences at a
given operating point (e.g. the stock Adam lr=1e-3 divergence on
pseudo-NYU, PERF.md) are properties of the operating point, not framework
infidelity.
"""
from __future__ import annotations

import numpy as np

import jax


def test_grad_and_adam_step_parity(goldens, hand_model):
    from tools import grad_parity_ab as ab
    from spherehand_tpu.data.sampler import sample_poses
    from spherehand_tpu.data.synthesizer import synthesize
    from spherehand_tpu.models.hourglass import convert_torch_state

    gold = goldens("grad_parity_ab")
    init = dict(goldens("grad_parity_init"))
    params0 = convert_torch_state(init, num_stacks=1)

    poses = sample_poses(jax.random.PRNGKey(ab.POSE_SEED), ab.SYNT_B)
    synt = synthesize(hand_model, jax.random.PRNGKey(ab.SYNT_SEED), poses)
    synt = jax.tree.map(np.asarray, synt)
    real = dict(
        dms=np.asarray(gold["real_dms"], np.float32),
        poses=np.asarray(gold["real_poses"], np.float32),
        inv_poses=np.asarray(gold["real_inv_poses"], np.float32),
    )

    # The synthetic batch must be bit-identical to the one the golden was
    # generated with; a digest mismatch means the RNG/synthesizer stream
    # changed and the golden must be regenerated (tools/grad_parity_ab.py).
    in_digest = ab.digest(np.asarray(synt.dms), real["dms"], real["poses"])
    assert in_digest == bytes(gold["input_digest"]).decode()

    j_terms, j_loss, grads_j, new_j = ab.jax_loss_and_grads(
        hand_model, params0, synt, real
    )

    # Loss terms: observed rel diffs 1e-6 (collision 5e-4, a clamp boundary).
    for key in gold.files:
        if not key.startswith("term_"):
            continue
        name = key[len("term_"):]
        assert name in j_terms, name
        t = float(gold[key])
        rel = abs(j_terms[name] - t) / max(abs(t), 1e-12)
        assert rel < 2e-3, (name, j_terms[name], t, rel)
    rel = abs(j_loss - float(gold["loss_total"])) / abs(float(gold["loss_total"]))
    assert rel < 1e-4, (j_loss, float(gold["loss_total"]))

    fg = ab.flatten_tree(grads_j)
    fn = ab.flatten_tree(new_j)
    checked = 0
    for k in sorted(fg):
        safe = k.replace("/", ".")
        gnorm_t = float(gold[f"gnorm_{safe}"])
        gslice_t = np.asarray(gold[f"gslice_{safe}"], np.float64)
        pslice_t = np.asarray(gold[f"pslice_{safe}"], np.float64)
        gj = np.asarray(fg[k], np.float64).reshape(-1)
        pj = np.asarray(fn[k], np.float64).reshape(-1)

        # Gradient magnitude: whole-tensor norm within 5% (observed max
        # rel-norm deviation 3.8e-2, all f32 rounding per the f64 check).
        gnorm_j = float(np.linalg.norm(gj))
        assert abs(gnorm_j - gnorm_t) <= 0.05 * gnorm_t + 1e-9, (
            k, gnorm_j, gnorm_t
        )
        # Gradient direction: the recorded first-16 slice, rel-norm diff
        # with an absolute floor for slices that are tiny vs the tensor.
        sj = gj[: gslice_t.size]
        d = float(np.linalg.norm(sj - gslice_t))
        tol = 0.1 * float(np.linalg.norm(gslice_t)) + 2e-3 * gnorm_t
        assert d <= tol, (k, d, tol)
        # Optimizer semantics: one Adam step moves each element by at most
        # ~lr; any lr/weight-decay/bias-correction infidelity shows up as an
        # elementwise deviation beyond 2.5x lr.
        assert np.max(np.abs(pj[: pslice_t.size] - pslice_t)) <= 2.5 * ab.LR, k
        checked += 1
    assert checked == sum(1 for f in gold.files if f.startswith("gnorm_"))
