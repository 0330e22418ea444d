"""Install/environment doctor: verify a spherehand_tpu checkout end to end.

The reference ships no equivalent — a broken CUDA build there surfaces as a
runtime import error deep inside training (mesh/cuda_kernel/setup.py must be
run by hand). Here one command checks every layer a new user needs: Python
deps, bundled assets, the accelerator, the kinematics/render compute path,
the data-parallel mesh, the serving API (mesh-sharded predict incl. the
non-divisible-batch padding path), and the native C++ shard loader, each
with a clear PASS/FAIL line and a nonzero exit code on failure.

Usage:
    python tools/doctor.py          # on the default backend (TPU if attached)
    python tools/doctor.py --cpu    # force CPU (also simulates an 8-dev mesh)

--cpu is the recommended first run on a fresh machine: it needs no
accelerator and finishes in ~2 minutes (one vCPU host).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_RESULTS: list[tuple[str, bool, str]] = []


def check(name: str):
    def deco(fn):
        def run(*a, **kw):
            t0 = time.perf_counter()
            try:
                msg = fn(*a, **kw) or "ok"
                _RESULTS.append((name, True, msg))
                print(f"  PASS  {name}: {msg} ({time.perf_counter() - t0:.1f}s)")
                return True
            except Exception as exc:  # noqa: BLE001 — each check must report, not raise
                _RESULTS.append((name, False, repr(exc)))
                print(f"  FAIL  {name}: {exc!r}")
                return False
        return run
    return deco


@check("python deps")
def deps():
    import flax, jax, optax, orbax.checkpoint  # noqa: F401
    import numpy  # noqa: F401
    return f"jax {jax.__version__}"


@check("assets")
def assets():
    import numpy as np
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "assets")
    names = [
        "hand_model.npz", "hand_model_lite.npz", "pose_vae.npz",
        "pose_denoiser.npz", "pose_prior_pca.npz",
        os.path.join("pretrained", "synthetic_params.npz"),
    ]
    missing = [n for n in names if not os.path.exists(os.path.join(root, n))]
    if missing:
        raise FileNotFoundError(
            f"{missing} — run `python tools/convert_assets.py` "
            f"(requires the reference checkout for regeneration)"
        )
    hand = np.load(os.path.join(root, "hand_model.npz"))
    assert hand["faces"].shape[0] == 3382, hand["faces"].shape
    return f"6 asset files, full mesh {hand['faces'].shape[0]} faces"


@check("device")
def device():
    import jax
    d = jax.devices()
    return f"{len(d)} x {d[0].platform} ({d[0].device_kind})"


@check("kinematics + render")
def render():
    import jax
    import jax.numpy as jnp

    from spherehand_tpu.data.sampler import sample_poses
    from spherehand_tpu.hand.assets import load_hand_model
    from spherehand_tpu.hand.kinematics import forward_kinematics
    from spherehand_tpu.render.raster import render_depth_64

    model = load_hand_model()

    @jax.jit
    def f(key):
        params = sample_poses(key, 2)
        transforms = forward_kinematics(model, params)
        return render_depth_64(model, transforms, jnp.ones((2,)))

    dm = jax.device_get(f(jax.random.key(0)))
    fg = dm < 99.0  # background = 100 (scaled mm)
    assert fg.any(), "no foreground pixels rendered"
    # Hand depths are signed mm about the crop center (±150 mm bound).
    assert -150.0 < float(dm[fg].mean()) < 90.0, float(dm[fg].mean())
    return f"64x64 depth ok, {int(fg.sum())} fg px across 2 frames"


@check("train step (tiny)")
def train_step():
    import jax
    import jax.numpy as jnp

    from spherehand_tpu.hand.assets import load_hand_model
    from spherehand_tpu.train.config import EngineConfig
    from spherehand_tpu.train.steps import build_steps

    cfg = EngineConfig(synt_batch=4, real_batch=2, num_stacks=1)
    steps = build_steps(cfg, load_hand_model(lite=True))
    state = steps.init_state(jax.random.key(0))
    state, m = jax.jit(steps.synt_step, donate_argnums=0)(
        state, jax.random.key(1), jnp.asarray(1e-3)
    )
    loss = float(m["loss"])
    assert loss == loss and loss > 0.0, loss  # finite, positive
    return f"synt loss {loss:.1f}"


@check("data-parallel mesh")
def mesh():
    import jax

    import numpy as np

    from spherehand_tpu.parallel.mesh import batch_sharding, data_mesh, shard_batch

    m = data_mesh()
    sharded = shard_batch(m, np.zeros((2 * len(m.devices.ravel()), 3)))
    assert sharded.sharding == batch_sharding(m), sharded.sharding
    return f"Mesh{tuple(m.devices.shape)} axes {m.axis_names}, batch sharded"


@check("serving API")
def serving():
    import numpy as np

    from spherehand_tpu.infer import PoseEstimator, load_params_npz
    from spherehand_tpu.parallel.mesh import data_mesh

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    params = load_params_npz(
        os.path.join(root, "assets", "pretrained", "synthetic_params.npz")
    )
    mesh = data_mesh()
    n_dev = mesh.devices.size
    # Non-divisible batch exercises the shard_map host-side padding path.
    dms = np.full((n_dev + 1, 64, 64), 100.0, np.float32)
    dms[:, 24:40, 24:40] = 40.0
    est = PoseEstimator(params, denoise=True, serve_chunk=2, mesh=mesh)
    joints = est.predict(dms)
    assert joints.shape == (n_dev + 1, 41, 3), joints.shape
    assert np.isfinite(joints).all()
    return f"predict ok: {joints.shape[0]} crops over {n_dev}-device mesh"


@check("native shard loader")
def native():
    from spherehand_tpu.data import native as n
    if not n.available():
        raise RuntimeError(
            "libshx failed to build/load — run `make -C native` and check g++"
        )
    return "libshx built and loadable"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU and simulate an 8-device mesh")
    args = ap.parse_args()
    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        # Persistent compile cache (same as bench.py): repeat doctor runs on
        # the TPU shouldn't pay the full remote-compile latency every time.
        import jax
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache"),
        )
    print("spherehand_tpu doctor")
    deps()
    assets()
    ok_dev = device()
    render()
    train_step()
    mesh()
    serving()
    native()
    failed = [n for n, ok, _ in _RESULTS if not ok]
    print(f"\n{len(_RESULTS) - len(failed)}/{len(_RESULTS)} checks passed"
          + (f" — FAILED: {', '.join(failed)}" if failed else ""))
    if not ok_dev:
        print("hint: no usable accelerator; rerun with --cpu to validate "
              "the install without one")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
