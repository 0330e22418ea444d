"""Generate numeric parity goldens from the reference implementation.

Runs the reference's pure-torch modules (no CUDA required) on fixed-seed
inputs and records input/output pairs as .npz files under tests/goldens/.
The test suite checks the TPU-native JAX ports against these arrays, so tests
never import torch or the reference tree.

Covered reference modules:
  - mesh/kinematicsTransformation.py  HandTransformationMat (26 params -> 17 mats)
  - mesh/pointTransformation.py       LinearBlendSkinning, OthographicalProjection
  - network/hourglass.py              stacked hourglass CNN (random weights)
  - network/pose_vae.py               PoseVae encoder/decoder (released weights)
  - network/pose_denoiser.py          PoseDenoiser MLP (released weights)

Must run from the repo root with /root/reference available. The reference uses
the long-removed ``np.float`` alias; we restore it before importing.
"""
from __future__ import annotations

import os
import sys

import numpy as np

REFERENCE = os.environ.get("SPHEREHAND_REFERENCE", "/root/reference")
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

np.float = float  # noqa: NPY001  (reference code predates numpy 2)
sys.path.insert(0, REFERENCE)

import pickle  # noqa: E402

import torch  # noqa: E402

torch.manual_seed(0)


def _load_mesh():
    with open(os.path.join(REFERENCE, "mesh", "model", "preprocessed_hand.pkl"), "rb") as f:
        return pickle.load(f)


def golden_fk(mesh) -> None:
    from mesh.kinematicsTransformation import HandTransformationMat

    offset_mats = [b["offset_matrix"].astype(np.float32) for b in mesh["bones"]]
    fk = HandTransformationMat(offset_mats)
    rng = np.random.RandomState(42)
    params = rng.uniform(-1.5, 1.5, size=(8, 26)).astype(np.float32)
    params[:, 3:6] = rng.uniform(-30, 30, size=(8, 3))  # translations in mm
    with torch.no_grad():
        mats = fk(torch.from_numpy(params)).numpy()
    np.savez_compressed(os.path.join(OUT_DIR, "fk.npz"), params=params, transforms=mats)
    print("fk.npz", mats.shape)


def golden_lbs(mesh) -> None:
    from mesh.pointTransformation import LinearBlendSkinning, OthographicalProjection

    # Keypoint LBS (41 spheres, one bone each) — mirrors render.py:56-90 wiring.
    vertices, weights, indices = [], [], []
    for b in mesh["bones"]:
        weights.append([])
        indices.append([])
        for pt, _ in b.get("keypoint", []):
            vertices.append([pt[0], pt[1], pt[2], 1.0])
            weights[-1].append(1.0)
            indices[-1].append(len(vertices) - 1)
    vertices = np.asarray(vertices, np.float32)
    kp_lbs = LinearBlendSkinning(vertices, weights, indices)

    # Full-mesh LBS — mirrors render.py:318-324 wiring.
    mesh_weights = [b["weight_coeff"] for b in mesh["bones"]]
    mesh_indices = [b["weight_vertexid"] for b in mesh["bones"]]
    mesh_lbs = LinearBlendSkinning(np.asarray(mesh["vertices"], np.float32), mesh_weights, mesh_indices)

    rng = np.random.RandomState(7)
    transforms = np.tile(np.eye(4, dtype=np.float32), (4, 17, 1, 1))
    transforms[..., :3, :3] += rng.uniform(-0.2, 0.2, size=(4, 17, 3, 3)).astype(np.float32)
    transforms[..., :3, 3] = rng.uniform(-40, 40, size=(4, 17, 3)).astype(np.float32)
    t = torch.from_numpy(transforms)
    with torch.no_grad():
        kp = kp_lbs(t).numpy()
        mesh_pts = mesh_lbs(t).numpy()

    camera = OthographicalProjection(320, 320, 640 / 300, 640 / 300)
    rand_f = torch.from_numpy(rng.uniform(0.9, 1.1, size=(4,)).astype(np.float32))
    with torch.no_grad():
        proj = camera(torch.from_numpy(mesh_pts), rand_f).numpy()
        proj_plain = camera(torch.from_numpy(mesh_pts)).numpy()
    np.savez_compressed(
        os.path.join(OUT_DIR, "lbs.npz"),
        transforms=transforms,
        keypoints=kp,
        mesh_points=mesh_pts,
        rand_f=rand_f.numpy(),
        projected=proj,
        projected_plain=proj_plain,
    )
    print("lbs.npz", kp.shape, mesh_pts.shape)


def golden_hourglass() -> None:
    from network.hourglass import create_hourglass_network

    torch.manual_seed(3)
    net = create_hourglass_network(82, num_stacks=2)
    net.eval()
    x = torch.randn(3, 64, 64)
    with torch.no_grad():
        outs, latents = net(x)
    params = {k.replace(".", "/"): v.detach().numpy() for k, v in net.state_dict().items()}
    np.savez_compressed(
        os.path.join(OUT_DIR, "hourglass.npz"),
        x=x.numpy(),
        out0=outs[0].numpy(),
        out1=outs[1].numpy(),
        latent0=latents[0].numpy(),
        latent1=latents[1].numpy(),
        **params,
    )
    print("hourglass.npz", outs[0].shape, len(params), "params")


def golden_pose_vae() -> None:
    from network.pose_vae import PoseVae

    vae = PoseVae(41 * 3, 32)
    ckpt = torch.load(
        os.path.join(REFERENCE, "mesh", "model", "pose_vae.pth"),
        map_location="cpu", weights_only=True,
    )
    vae.load_state_dict(ckpt["network_state_dict"])
    vae.eval()
    rng = np.random.RandomState(11)
    x = rng.uniform(-1, 1, size=(6, 123)).astype(np.float32)
    with torch.no_grad():
        recon, mu, logvar, likelihood = vae(torch.from_numpy(x), do_reparameterize=False)
    np.savez_compressed(
        os.path.join(OUT_DIR, "pose_vae.npz"),
        x=x, recon=recon.numpy(), mu=mu.numpy(), logvar=logvar.numpy(),
        likelihood=np.float32(likelihood.item()),
    )
    print("pose_vae.npz", recon.shape)


def golden_pose_denoiser() -> None:
    from network.pose_denoiser import PoseDenoiser

    den = PoseDenoiser()
    ckpt = torch.load(
        os.path.join(REFERENCE, "mesh", "model", "pose_denoiser.pth"),
        map_location="cpu", weights_only=True,
    )
    den.load_state_dict(ckpt["network_state_dict"])
    den.eval()
    rng = np.random.RandomState(13)
    joints = rng.uniform(-120, 120, size=(5, 41, 3)).astype(np.float32)
    with torch.no_grad():
        out = den(torch.from_numpy(joints)).numpy()
    np.savez_compressed(os.path.join(OUT_DIR, "pose_denoiser.npz"), joints=joints, denoised=out)
    print("pose_denoiser.npz", out.shape)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    mesh = _load_mesh()
    golden_fk(mesh)
    golden_lbs(mesh)
    golden_hourglass()
    golden_pose_vae()
    golden_pose_denoiser()


if __name__ == "__main__":
    main()
