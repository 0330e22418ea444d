"""End-to-end GRADIENT and OPTIMIZER-STEP parity vs the reference torch stack.

Why this exists: the reference-recipe run at reference scale
(tools/reference_recipe.py) shows the stock Adam lr=1e-3 operating point
degrading the pretrained model on pseudo-NYU (49.9 mm -> ~95 mm), while the
same code at lr 3e-5 closes the domain gap. Loss VALUES are already
golden-pinned per module; what was NOT pinned is the end-to-end training
dynamics: d(total combined loss)/d(every network parameter) and the first
Adam update. If those match torch at the same point, then the divergence is
a property of the operating point (data/init/lr), not a framework
infidelity — identical gradients + identical optimizer semantics cannot
produce different trajectories on the same data stream.

What it does (all CPU, single fixed batch, num_stacks=1):
  1. Builds the reference HeatmapEstimationNetwork + MultiTaskLoss
     (network/create_network_and_criterion.py:27-135,165-263) with the
     make_goldens.py CUDA-stub recipe, torch-seeded random weights, eval()
     mode (train mode only adds the 50%-random resize-crop branch,
     create_network_and_criterion.py:41-52 — mirrored by our
     forward(real_aug=False)).
  2. Converts the weights to flax via models.hourglass.convert_torch_state
     (the tested .pth import path) so both sides start at the SAME point.
  3. Generates one deterministic combined batch with OUR pipeline
     (synthetic: data/sampler+synthesizer; real: the pseudo-NYU generator)
     and feeds the identical arrays to both stacks.
  4. Computes the combined loss (synt_uv/synt_d/mv_projection/
     mv_consistency/uv_hm_mean/collision/bone_length; prior EXCLUDED on
     both sides — the reference PoseVae prior_loss reparameterizes with
     torch.randn (network/pose_vae.py:81-89), which cannot be
     noise-matched across frameworks; its value path is pinned by the
     pose_vae goldens) and backprops through BOTH stacks.
  5. Applies ONE Adam(lr=1e-3, weight_decay=1e-5) step on both sides
     (torch.optim.Adam vs train/steps.make_optimizer).
  6. Prints per-term loss diffs, per-tensor gradient rel-norm diffs, and
     post-step parameter rel diffs; writes a compact golden
     (tests/goldens/grad_parity_ab.npz) holding the TORCH side: loss terms,
     per-tensor grad norms + first-16 slices, post-Adam param slices, and
     input digests. tests/test_grad_parity.py recomputes the JAX side from
     the same seeds and asserts against it (never importing torch).

Run from the repo root: python tools/grad_parity_ab.py
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("SPHEREHAND_REFERENCE", "/root/reference")
sys.path.insert(0, REPO)

# Match tests/conftest.py's virtual 8-device CPU topology: XLA:CPU results
# are bitwise-sensitive to the device split (intra-op thread blocking), and
# the golden's input digest must reproduce inside the test environment.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
X64 = os.environ.get("SPHEREHAND_AB_X64", "0") == "1"
if X64:
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

# Deterministic input construction (shared with tests/test_grad_parity.py).
SYNT_B = 8
REAL_B = 4
POSE_SEED = 11
SYNT_SEED = 12
REAL_SEED = 123
REAL_SAMPLES = 256  # the pseudo-NYU generator renders in 256-sample chunks
REAL_IDX = (3, 17, 42, 59)
LR = 1e-3
WEIGHT_DECAY = 1e-5


def build_inputs(data_dir: str):
    """The fixed combined batch, reproducible from seeds alone."""
    from spherehand_tpu.data.sampler import sample_poses
    from spherehand_tpu.data.synthesizer import synthesize
    from spherehand_tpu.hand.assets import load_hand_model

    hand = load_hand_model()
    poses = sample_poses(jax.random.PRNGKey(POSE_SEED), SYNT_B)
    synt = synthesize(hand, jax.random.PRNGKey(SYNT_SEED), poses)
    synt = jax.tree.map(np.asarray, synt)

    from tools.selfsup_demo import generate_pseudo_nyu

    train_dir = os.path.join(data_dir, "train")
    if not os.path.exists(os.path.join(train_dir, "mv_data_0_shape.pkl")):
        generate_pseudo_nyu(train_dir, REAL_SAMPLES, seed=REAL_SEED)
    from spherehand_tpu.data.nyu import NyuDataset

    dms, joints, poses_c, inv_poses = NyuDataset(train_dir).gather(
        np.asarray(REAL_IDX)
    )
    real = dict(
        dms=np.asarray(dms, np.float32),
        joints=np.asarray(joints, np.float32),
        poses=np.asarray(poses_c, np.float32),
        inv_poses=np.asarray(inv_poses, np.float32),
    )
    return hand, synt, real


def digest(*arrays: np.ndarray) -> str:
    h = hashlib.sha256()
    for a in arrays:
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()[:16]


def jax_loss_and_grads(hand, params, synt, real):
    """Our side: combined loss (prior off), grads, and one Adam update."""
    from spherehand_tpu.constants import Constants
    from spherehand_tpu.losses.multitask import (
        LossConfig, combine_loss, multitask_loss,
    )
    from spherehand_tpu.models.estimator import forward, make_network
    from spherehand_tpu.train.steps import make_optimizer

    _C = Constants()
    network = make_network(1, dtype=jnp.float64 if X64 else None)
    cfg = LossConfig(prior=False)
    radii = hand.kp_radius
    if X64:
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), params)
        synt = jax.tree.map(
            lambda a: np.asarray(a, np.float64)
            if np.issubdtype(np.asarray(a).dtype, np.floating) else a, synt
        )
        real = {k: v.astype(np.float64) for k, v in real.items()}
        radii = jnp.asarray(radii, jnp.float64)
    real_target = {
        "real_dms": jnp.asarray(real["dms"]),
        "camera_poses": jnp.asarray(real["poses"]),
        "inv_camera_poses": jnp.asarray(real["inv_poses"]),
    }
    scaled_real = jnp.asarray(real["dms"]) * _C.depth_scale

    def loss_fn(p):
        out = forward(
            network, p,
            synt_dms=jnp.asarray(synt.dms),
            real_dms=scaled_real,
            train=True, real_aug=False,
        )
        terms, _, _ = multitask_loss(
            cfg, out, radii,
            synt_target=jax.tree.map(jnp.asarray, synt),
            real_target=real_target,
            is_mv=True,
        )
        return combine_loss(terms), terms

    (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    import optax

    # Mirror steps._apply_updates: lr scales the tx direction at apply time.
    tx = make_optimizer(WEIGHT_DECAY)
    opt_state = tx.init(params)
    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(
        params, jax.tree.map(lambda u: -LR * u, updates)
    )
    return (
        {k: float(v) for k, v in terms.items()},
        float(loss),
        jax.tree.map(np.asarray, grads),
        jax.tree.map(np.asarray, new_params),
    )


def torch_reference_side(synt, real):
    """Reference torch stack: build net+criterion, loss, grads, Adam step."""
    os.chdir(REFERENCE)
    np.float = float  # noqa  (reference code predates numpy 2)
    sys.path.insert(0, REFERENCE)
    import torch

    torch.manual_seed(7)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    stub_pkg = types.ModuleType("mesh.cuda_kernel")
    stub_ext = types.ModuleType("mesh.cuda_kernel.depth_rasterization")
    stub_ext.forward = None
    stub_pkg.depth_rasterization = stub_ext
    sys.modules.setdefault("mesh.cuda_kernel", stub_pkg)
    sys.modules.setdefault("mesh.cuda_kernel.depth_rasterization", stub_ext)

    from network.constants import Constant
    from network.create_network_and_criterion import (
        HeatmapEstimationNetwork, MultiTaskLoss,
    )

    constant = Constant()

    net = HeatmapEstimationNetwork(
        constant.heatmap_size, constant.depth_scale, constant.num_joint, 1
    )
    net.eval()  # train() only adds the random resize-crop branch
    criterion = MultiTaskLoss(
        True,   # synthesize
        True,   # mv_projection
        True,   # mv_consistency
        False,  # temporal
        False,  # prior (see module docstring)
        True,   # collision
        True,   # bone_length
        constant,
        image_size=constant.depthmap_size,
    )

    synt_dms = torch.from_numpy(np.asarray(synt.dms, np.float32))
    real_dms = torch.from_numpy(np.asarray(real["dms"], np.float32))
    result = net(
        synt_dms=synt_dms, real_dms=real_dms * constant.depth_scale
    )
    real_target = {
        "real_dms": real_dms,
        "camera_poses": torch.from_numpy(np.asarray(real["poses"], np.float32)),
        "inv_camera_poses": torch.from_numpy(np.asarray(real["inv_poses"], np.float32)),
        "is_mv": True,
    }
    synt_target = {
        "uv_hms": torch.from_numpy(np.asarray(synt.uv_hms, np.float32)),
        "d_hms": torch.from_numpy(np.asarray(synt.d_hms, np.float32)),
        "xyz_pts": torch.from_numpy(np.asarray(synt.xyz, np.float32)),
    }
    terms, _ = criterion(result, real_target=real_target,
                         synt_target=synt_target)
    loss = sum(terms.values())
    opt = torch.optim.Adam(net.parameters(), lr=LR,
                           weight_decay=WEIGHT_DECAY)
    opt.zero_grad()
    loss.backward()

    hg_grads = {
        name.replace(".", "/"): p.grad.detach().numpy().copy()
        for name, p in net.hg.named_parameters()
    }

    # f64 oracle pass: same weights, double precision. Measures how far the
    # f32 computation drifts from the exact gradient purely by rounding —
    # the yardstick against which the JAX-f32 deviation must be judged.
    torch.manual_seed(7)
    net64 = HeatmapEstimationNetwork(
        constant.heatmap_size, constant.depth_scale, constant.num_joint, 1
    )
    net64.eval()
    net64.load_state_dict(
        {k: v.clone() for k, v in net.state_dict().items()}
    )
    net64 = net64.double()
    crit64 = MultiTaskLoss(
        True, True, True, False, False, True, True,
        constant, image_size=constant.depthmap_size,
    ).double()
    result64 = net64(
        synt_dms=synt_dms.double(),
        real_dms=(real_dms * constant.depth_scale).double(),
    )
    real_target64 = {
        "real_dms": real_dms.double(),
        "camera_poses": real_target["camera_poses"].double(),
        "inv_camera_poses": real_target["inv_camera_poses"].double(),
        "is_mv": True,
    }
    synt_target64 = {k: v.double() for k, v in synt_target.items()}
    terms64, _ = crit64(result64, real_target=real_target64,
                        synt_target=synt_target64)
    loss64 = sum(terms64.values())
    net64.zero_grad()
    loss64.backward()
    hg_grads64 = {
        name.replace(".", "/"): p.grad.detach().numpy().copy()
        for name, p in net64.hg.named_parameters()
    }

    opt.step()
    hg_new = {
        name.replace(".", "/"): p.detach().numpy().copy()
        for name, p in net.hg.named_parameters()
    }
    state = {
        name.replace(".", "/"): p.detach().numpy().copy()
        for name, p in net.hg.state_dict().items()
    }
    os.chdir(REPO)
    return (
        {k: float(v) for k, v in terms.items()},
        float(loss),
        state,  # post-step (converted to init below by caller order)
        hg_grads,
        hg_new,
        hg_grads64,
    )


def flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "tests", "goldens", "grad_parity_ab.npz"))
    ap.add_argument("--data_dir", default="/tmp/grad_ab_data")
    args = ap.parse_args()

    hand, synt, real = build_inputs(args.data_dir)
    in_digest = digest(np.asarray(synt.dms), real["dms"], real["poses"])
    print(f"inputs: synt {np.asarray(synt.dms).shape} real "
          f"{real['dms'].shape} digest {in_digest}", flush=True)

    import torch  # noqa: F401  (fail fast if absent)

    # ---- torch side FIRST (it owns the init weights) ----------------------
    # NOTE: torch_reference_side steps the optimizer, so capture the init
    # weights before the step by re-seeding identically inside.
    (t_terms, t_loss, t_state_post, t_grads, t_new, t_grads64) = (
        torch_reference_side(synt, real)
    )

    # Rebuild the init deterministically (same torch.manual_seed(7) path)
    # to hand to the JAX side: post-step state minus the Adam update is NOT
    # recoverable, so re-instantiate.
    sys.path.insert(0, REFERENCE)
    import torch as _t

    _t.manual_seed(7)
    from network.constants import Constant
    from network.create_network_and_criterion import HeatmapEstimationNetwork

    constant = Constant()

    os.chdir(REFERENCE)
    net0 = HeatmapEstimationNetwork(
        constant.heatmap_size, constant.depth_scale, constant.num_joint, 1
    )
    os.chdir(REPO)
    init_state = {
        name.replace(".", "/"): p.detach().numpy().copy()
        for name, p in net0.hg.state_dict().items()
    }

    from spherehand_tpu.models.hourglass import convert_torch_state

    params0 = convert_torch_state(init_state, num_stacks=1)
    grads_t = convert_torch_state(t_grads, num_stacks=1)
    new_t = convert_torch_state(t_new, num_stacks=1)
    grads_t64 = convert_torch_state(t_grads64, num_stacks=1)

    # ---- JAX side ---------------------------------------------------------
    j_terms, j_loss, grads_j, new_j = jax_loss_and_grads(
        hand, params0, synt, real
    )

    # ---- compare ----------------------------------------------------------
    name_map = {  # ours -> reference term names
        "synt_uv": "synt_uv", "synt_d": "synt_d",
        "mv_projection": "mv_projection",
        "mv_consistency": "mv_consistency",
        "uv_hm_mean": "uv_hm_mean", "collision": "collision",
        "bone_length": "bone_length",
    }
    print(f"{'term':16s} {'jax':>14s} {'torch':>14s} {'rel':>10s}")
    for k, tk in name_map.items():
        if k not in j_terms or tk not in t_terms:
            print(f"{k:16s} MISSING j={k in j_terms} t={tk in t_terms}")
            continue
        a, b = j_terms[k], t_terms[tk]
        rel = abs(a - b) / max(abs(b), 1e-12)
        print(f"{k:16s} {a:14.6f} {b:14.6f} {rel:10.2e}")
    rel_loss = abs(j_loss - t_loss) / max(abs(t_loss), 1e-12)
    print(f"{'TOTAL':16s} {j_loss:14.6f} {t_loss:14.6f} {rel_loss:10.2e}")

    fg_j, fg_t = flatten_tree(grads_j), flatten_tree(grads_t)
    fg_64 = flatten_tree(grads_t64)
    fn_j, fn_t = flatten_tree(new_j), flatten_tree(new_t)
    assert fg_j.keys() == fg_t.keys(), (
        sorted(fg_j.keys() - fg_t.keys()), sorted(fg_t.keys() - fg_j.keys())
    )
    worst = []
    for k in sorted(fg_j):
        gj, gt, g64 = fg_j[k], fg_t[k], fg_64[k]
        d64 = max(float(np.linalg.norm(g64)), 1e-12)
        rel_jt = float(np.linalg.norm(gj - gt)) / max(
            float(np.linalg.norm(gt)), 1e-12
        )
        rel_j64 = float(np.linalg.norm(gj - g64)) / d64
        rel_t64 = float(np.linalg.norm(gt - g64)) / d64
        prel = float(np.linalg.norm(fn_j[k] - fn_t[k])) / max(
            float(np.linalg.norm(fn_t[k])), 1e-12
        )
        worst.append((rel_jt, rel_j64, rel_t64, prel, k, d64))
    worst.sort(reverse=True)
    print("\nworst grad tensors "
          "(jax-vs-torch32, jax-vs-f64, torch32-vs-f64, post-Adam param rel):")
    for rel_jt, rel_j64, rel_t64, prel, k, nrm in worst[:8]:
        print(f"  {rel_jt:10.3e} {rel_j64:10.3e} {rel_t64:10.3e} "
              f"{prel:10.3e} {k} |g|={nrm:.3e}")
    max_grad_rel = worst[0][0]
    max_j64 = max(w[1] for w in worst)
    max_t64 = max(w[2] for w in worst)
    max_param_rel = max(w[3] for w in worst)
    print(f"\nmax grad rel jax-vs-torch32 {max_grad_rel:.3e}; "
          f"max post-Adam param rel {max_param_rel:.3e}")
    jlbl = "jax-f64" if X64 else "jax-f32"
    print(f"f64-oracle distances: max {jlbl} {max_j64:.3e} vs "
          f"max torch-f32 {max_t64:.3e} "
          f"(ratio {max_j64 / max(max_t64, 1e-300):.2f})")
    if X64:
        print("jax-f64 << torch-f32-rounding => both stacks compute the "
              "same mathematical gradient; all f32 deviation is rounding")

    # ---- golden ------------------------------------------------------------
    gold = {
        "input_digest": np.frombuffer(in_digest.encode(), np.uint8),
        "loss_total": np.float64(t_loss),
        # The real-batch inputs ride along (~200 kB) so the regression test
        # can skip the minutes-long pseudo-NYU generation; the synthetic
        # batch is cheap to rebuild from seeds and digest-checked instead.
        "real_dms": real["dms"].astype(np.float32),
        "real_poses": real["poses"].astype(np.float32),
        "real_inv_poses": real["inv_poses"].astype(np.float32),
    }
    for k, v in t_terms.items():
        gold[f"term_{k}"] = np.float64(v)
    for k in sorted(fg_t):
        safe = k.replace("/", ".")
        gold[f"gnorm_{safe}"] = np.float64(np.linalg.norm(fg_t[k]))
        gold[f"gslice_{safe}"] = fg_t[k].reshape(-1)[:16].astype(np.float64)
        gold[f"pslice_{safe}"] = fn_t[k].reshape(-1)[:16].astype(np.float64)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **gold)
    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e3:.0f} kB)")

    # Companion golden: the torch-seeded init weights (torch naming), so
    # tests/test_grad_parity.py can rebuild the JAX side via
    # convert_torch_state without importing torch.
    init_out = os.path.join(os.path.dirname(args.out), "grad_parity_init.npz")
    np.savez_compressed(
        init_out, **{k: v.astype(np.float32) for k, v in init_state.items()}
    )
    print(f"wrote {init_out} ({os.path.getsize(init_out)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
