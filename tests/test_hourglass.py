"""Hourglass CNN parity against the torch reference (random-weight golden)."""
import numpy as np

import jax
import jax.numpy as jnp

from spherehand_tpu.models.hourglass import HourglassNet, convert_torch_state


def test_hourglass_matches_torch_golden(goldens):
    g = goldens("hourglass")
    state = {k: g[k] for k in g.files if "/" in k}
    params = convert_torch_state(state, num_stacks=2)
    net = HourglassNet(num_stacks=2, num_outputs=82)
    x = jnp.asarray(g["x"])  # (3, 64, 64) single-channel depth maps
    scores, latents = net.apply({"params": params}, x)
    assert len(scores) == 2 and len(latents) == 2
    # NHWC -> NCHW for comparison with the torch outputs.
    np.testing.assert_allclose(
        np.asarray(scores[0]).transpose(0, 3, 1, 2), g["out0"], atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(scores[1]).transpose(0, 3, 1, 2), g["out1"], atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(latents[0]).transpose(0, 3, 1, 2), g["latent0"], atol=2e-3, rtol=1e-3
    )


def test_hourglass_init_and_shapes():
    net = HourglassNet(num_stacks=1, num_outputs=82)
    x = jnp.zeros((2, 64, 64))
    params = net.init(jax.random.key(0), x)
    scores, latents = net.apply(params, x)
    assert scores[0].shape == (2, 16, 16, 82)
    assert latents[0].shape == (2, 4, 4, 256)


def test_hourglass_bf16_close_to_f32():
    import jax.numpy as jnp

    net32 = HourglassNet(num_stacks=1, num_outputs=82)
    net16 = HourglassNet(num_stacks=1, num_outputs=82, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (2, 64, 64)), jnp.float32)
    params = net32.init(jax.random.key(1), x)["params"]
    s32, l32 = net32.apply({"params": params}, x)
    s16, l16 = net16.apply({"params": params}, x)
    assert s16[0].dtype == jnp.float32  # heads cast back to f32
    # bf16 has ~3 decimal digits; scores are O(0.1)
    np.testing.assert_allclose(
        np.asarray(s16[0]), np.asarray(s32[0]), atol=0.05
    )


def test_pth_checkpoint_roundtrip(goldens, tmp_path):
    """A torch.save'd .pth round-trips through tools/import_torch_checkpoint
    into load_params_npz-format and reproduces the golden outputs — so a
    released reference checkpoint (README.md:35-42) imports one-command."""
    torch = __import__("pytest").importorskip("torch")
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from import_torch_checkpoint import import_checkpoint

    from spherehand_tpu.infer import load_params_npz

    g = goldens("hourglass")
    meta = {"x", "out0", "out1", "latent0", "latent1"}
    # DataParallel-style 'module.' prefixes + a {'state_dict': ...} envelope,
    # the wrappers released checkpoints typically carry.
    state = {
        "module." + k.replace("/", "."): torch.from_numpy(np.asarray(g[k]))
        for k in g.files
        if k not in meta
    }
    pth = tmp_path / "released.pth"
    torch.save({"state_dict": state}, str(pth))

    out_npz = tmp_path / "imported.npz"
    import_checkpoint(str(pth), str(out_npz), num_stacks=2)
    params = load_params_npz(str(out_npz))

    net = HourglassNet(num_stacks=2, num_outputs=82)
    outs, _ = net.apply({"params": params}, jnp.asarray(g["x"]))
    # NHWC -> NCHW for comparison with the torch outputs.
    np.testing.assert_allclose(
        np.asarray(outs[0]).transpose(0, 3, 1, 2), g["out0"], atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(outs[1]).transpose(0, 3, 1, 2), g["out1"], atol=2e-3, rtol=1e-3
    )


def test_pth_checkpoint_roundtrip_num_stacks_1(goldens, tmp_path):
    """num_stacks=1 import path (VERDICT r2 #7): the golden's stack-0 weights
    (stack-1 and the inter-stack connectors dropped) import at num_stacks=1
    and reproduce the golden's first-stack output — out0 is computed before
    the inter-stack merge, so it is stack-count-invariant."""
    torch = __import__("pytest").importorskip("torch")
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from import_torch_checkpoint import import_checkpoint

    from spherehand_tpu.infer import load_params_npz

    g = goldens("hourglass")
    meta = {"x", "out0", "out1", "latent0", "latent1"}

    def stack1_key(k):
        head = k.split("/")[:2]
        return (
            head[0] in ("fc_", "score_")             # inter-stack connectors
            or (head[0] in ("hg", "res", "fc", "score") and head[1] == "1")
        )

    state = {
        k.replace("/", "."): torch.from_numpy(np.asarray(g[k]))
        for k in g.files
        if k not in meta and not stack1_key(k)
    }
    pth = tmp_path / "ns1.pth"
    torch.save(state, str(pth))
    out_npz = tmp_path / "imported_ns1.npz"
    import_checkpoint(str(pth), str(out_npz), num_stacks=1)
    params = load_params_npz(str(out_npz))

    net = HourglassNet(num_stacks=1, num_outputs=82)
    outs, _ = net.apply({"params": params}, jnp.asarray(g["x"]))
    assert len(outs) == 1
    np.testing.assert_allclose(
        np.asarray(outs[0]).transpose(0, 3, 1, 2), g["out0"], atol=2e-3, rtol=1e-3
    )
