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
OUT_DIR = os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests", "goldens")
)
# Some reference modules open asset paths relative to the reference root
# (network/constants.py:4).
os.chdir(REFERENCE)

np.float = float  # noqa: NPY001  (reference code predates numpy 2)
sys.path.insert(0, REFERENCE)

import pickle  # noqa: E402
import types  # noqa: E402

import torch  # noqa: E402

torch.manual_seed(0)

# Some reference modules call .cuda() at import time (mesh/bone_length.py:33);
# make it a no-op on this CPU-only box.
torch.nn.Module.cuda = lambda self, *a, **k: self
torch.Tensor.cuda = lambda self, *a, **k: self

# mesh/render.py imports the compiled CUDA extension at module import time
# (mesh/render.py:6); inject a stub so its pure-torch modules load on CPU.
_stub_pkg = types.ModuleType("mesh.cuda_kernel")
_stub_ext = types.ModuleType("mesh.cuda_kernel.depth_rasterization")
_stub_ext.forward = None
_stub_pkg.depth_rasterization = _stub_ext
sys.modules.setdefault("mesh.cuda_kernel", _stub_pkg)
sys.modules.setdefault("mesh.cuda_kernel.depth_rasterization", _stub_ext)


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


def _mesh_radii(mesh) -> list:
    radii = []
    for bone in mesh["bones"]:
        for _, radius in bone.get("keypoint", []):
            radii.append(radius)
    return radii


def golden_sphere_render(mesh) -> None:
    from mesh.render import BallRender, DataToModelLoss

    rng = np.random.RandomState(21)
    centers = rng.uniform(-120, 120, size=(40, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(10, 90, size=40)
    radii = rng.uniform(4, 30, size=40).astype(np.float32)
    ball = BallRender(64, 64)
    with torch.no_grad():
        maps = ball(torch.from_numpy(centers), torch.from_numpy(radii)).numpy()

    # DataToModelLoss on a rendered multi-sphere depth map (mm units).
    radii_41 = _mesh_radii(mesh)
    d2m = DataToModelLoss(64, 64, radii_41)
    joints = rng.uniform(-100, 100, size=(3, 41, 3)).astype(np.float32)
    joints[..., 2] = rng.uniform(20, 80, size=(3, 41))
    with torch.no_grad():
        part = ball(
            torch.from_numpy(joints.reshape(-1, 3)),
            torch.tensor(radii_41).repeat(3),
        ).view(3, 41, 64, 64)
        dms = part.min(dim=1)[0]
        query = rng.uniform(-100, 100, size=(3, 41, 3)).astype(np.float32)
        loss = d2m(dms, torch.from_numpy(query))
    np.savez_compressed(
        os.path.join(OUT_DIR, "sphere_render.npz"),
        centers=centers, radii=radii, maps=maps,
        radii_41=np.asarray(radii_41, np.float32),
        joints=joints, dms=dms.numpy(), query=query,
        d2m_loss=np.float32(loss.item()),
    )
    print("sphere_render.npz", maps.shape)


def golden_heatmap_render(mesh) -> None:
    from mesh.render import HeatmapRender, Hand3DHeatmapRender
    from mesh.kinematicsTransformation import HandTransformationMat

    rng = np.random.RandomState(5)
    uvd = rng.uniform(-2, 18, size=(4, 41, 3)).astype(np.float32)
    hm = HeatmapRender(16)
    with torch.no_grad():
        uv_hms, d_hms = hm(torch.from_numpy(uvd))

    offset_mats = [b["offset_matrix"].astype(np.float32) for b in mesh["bones"]]
    fk = HandTransformationMat(offset_mats)
    h3d = Hand3DHeatmapRender(mesh["bones"], 16)
    params = rng.uniform(-1.0, 1.0, size=(4, 26)).astype(np.float32)
    params[:, 3:6] = rng.uniform(-20, 20, size=(4, 3))
    rand_f = torch.from_numpy(rng.uniform(0.9, 1.1, size=(4,)).astype(np.float32))
    with torch.no_grad():
        mats = fk(torch.from_numpy(params))
        h_uv, h_d, h_xyz = h3d(mats, rand_f)
    np.savez_compressed(
        os.path.join(OUT_DIR, "heatmap_render.npz"),
        uvd=uvd, uv_hms=uv_hms.numpy(), d_hms=d_hms.numpy(),
        params=params, transforms=mats.numpy(), rand_f=rand_f.numpy(),
        hand_uv_hms=h_uv.numpy(), hand_d_hms=h_d.numpy(), hand_xyz=h_xyz.numpy(),
    )
    print("heatmap_render.npz", uv_hms.shape, h_xyz.shape)


def golden_geometric_losses(mesh) -> None:
    from mesh.render import CollisionLoss, BoneLengthLoss

    rng = np.random.RandomState(9)
    joints = rng.uniform(-60, 60, size=(5, 41, 3)).astype(np.float32)
    coll = CollisionLoss()
    bone = BoneLengthLoss()
    with torch.no_grad():
        c = coll(torch.from_numpy(joints))
        b = bone(torch.from_numpy(joints))
    np.savez_compressed(
        os.path.join(OUT_DIR, "geometric_losses.npz"),
        joints=joints,
        collision=np.float32(c.item()),
        bone_length=np.float32(b.item()),
        bl_joint_1=bone.joint_1.numpy(),
        bl_joint_2=bone.joint_2.numpy(),
        bl_min_sq=bone.min_length.numpy(),
        bl_max_sq=bone.max_length.numpy(),
    )
    print("geometric_losses.npz", c.item(), b.item())


def golden_multiview(mesh) -> None:
    from mesh.multiview_utility import MutualProjectionLoss, MultiviewConsistencyLoss

    rng = np.random.RandomState(17)
    B, V, J = 2, 3, 41
    radii_41 = _mesh_radii(mesh)
    joints = rng.uniform(-80, 80, size=(B, V, J, 3)).astype(np.float32)
    joints[..., 2] = rng.uniform(20, 80, size=(B, V, J))
    # random rotation-only camera poses (reference translations are ~0)
    def rand_rot():
        q = rng.normal(size=4); q /= np.linalg.norm(q)
        w, x, y, z = q
        return np.asarray([
            [1-2*(y*y+z*z), 2*(x*y-w*z), 2*(x*z+w*y)],
            [2*(x*y+w*z), 1-2*(x*x+z*z), 2*(y*z-w*x)],
            [2*(x*z-w*y), 2*(y*z+w*x), 1-2*(x*x+y*y)]], np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    for b in range(B):
        for v in range(1, V):
            poses[b, v, :3, :3] = rand_rot()
    inv_poses = np.linalg.inv(poses)
    dms = rng.uniform(10, 110, size=(B, V, 64, 64)).astype(np.float32)
    dms[dms > 95] = 100.0

    mpl = MutualProjectionLoss(64, radii_41)
    mvc = MultiviewConsistencyLoss()
    with torch.no_grad():
        loss_mv, proj_dms = mpl(
            torch.from_numpy(poses), torch.from_numpy(inv_poses),
            torch.from_numpy(joints), torch.from_numpy(dms), True)
        loss_sv, _ = mpl(
            torch.from_numpy(poses), torch.from_numpy(inv_poses),
            torch.from_numpy(joints), torch.from_numpy(dms), False)
        cons = mvc(torch.from_numpy(poses), torch.from_numpy(joints))
    np.savez_compressed(
        os.path.join(OUT_DIR, "multiview.npz"),
        joints=joints, poses=poses, inv_poses=inv_poses, dms=dms,
        mv_loss=np.float32(loss_mv.item()), sv_loss=np.float32(loss_sv.item()),
        consistency=np.float32(cons.item()), projected_dms=proj_dms.numpy(),
    )
    print("multiview.npz", loss_mv.item(), loss_sv.item(), cons.item())


def golden_multiview_extras(mesh) -> None:
    """Temporal smoothness, weighted MV consistency, FuseMvPose — the
    imported-but-dormant reference modules (util_modules.py:349-381,
    multiview_utility.py:170-237)."""
    from mesh.multiview_utility import FuseMvPose, WeightedMultiviewConsistencyLoss
    from network.util_modules import TemporalSmoothnessLoss

    rng = np.random.RandomState(23)
    B, V, J = 3, 3, 41
    joints = rng.uniform(-80, 80, size=(B, V, J, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))

    def rand_rot():
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        return np.asarray([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ], np.float32)

    for b in range(B):
        for v in range(1, V):
            poses[b, v, :3, :3] = rand_rot()
    inv_poses = np.linalg.inv(poses).astype(np.float32)
    hm_weight = rng.uniform(0.1, 1.0, size=(B, V, J, 1)).astype(np.float32)
    uv_hm = rng.uniform(0.0, 1.0, size=(B, V, J, 16, 16)).astype(np.float32)
    joints2 = rng.uniform(-80, 80, size=(B, V, J, 3)).astype(np.float32)

    temporal = TemporalSmoothnessLoss()
    wmvc = WeightedMultiviewConsistencyLoss()
    fuse = FuseMvPose()
    with torch.no_grad():
        t_first = temporal(torch.from_numpy(joints))   # previous_skel None
        t_second = temporal(torch.from_numpy(joints2))  # carried state
        w_loss = wmvc(
            torch.from_numpy(poses), torch.from_numpy(joints),
            torch.from_numpy(hm_weight),
        )
        fused = fuse(
            torch.from_numpy(joints), torch.from_numpy(poses),
            torch.from_numpy(inv_poses), torch.from_numpy(uv_hm),
        )
    np.savez_compressed(
        os.path.join(OUT_DIR, "multiview_extras.npz"),
        joints=joints, joints2=joints2, poses=poses, inv_poses=inv_poses,
        hm_weight=hm_weight[..., 0], uv_hm=uv_hm,
        temporal_first=np.float32(t_first.item()),
        temporal_second=np.float32(t_second.item()),
        weighted_consistency=np.float32(w_loss.item()),
        fused_joints=fused.numpy(),
    )
    print("multiview_extras.npz", t_first.item(), t_second.item(), w_loss.item())


def golden_nyu_crop() -> None:
    sys.path.insert(0, os.path.join(REFERENCE, "dataset"))
    import utils as ref_utils

    rng = np.random.RandomState(31)
    dm = rng.uniform(400, 1500, size=(480, 640)).astype(np.float32)
    # carve a "hand" blob at a known depth so the crop has structure
    dm[200:280, 300:380] = rng.uniform(820, 900, size=(80, 80))
    center = np.asarray([40.0, -30.0, 860.0], np.float32)
    cam = ref_utils.CameraIntrinsic()
    cropped = ref_utils.crop_dm(dm, center, cam, (300, 300, 300), (64, 64))

    pts1 = rng.uniform(-80, 80, size=(36, 3)).astype(np.float64)
    ang = 0.4
    rot = np.asarray(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    )
    pts2 = pts1 @ rot.T + np.asarray([5.0, -3.0, 2.0])
    transform = ref_utils.estimate_rigid_transformation(pts1, pts2)
    np.savez_compressed(
        os.path.join(OUT_DIR, "nyu_crop.npz"),
        dm=dm, center=center, cropped=cropped.astype(np.float32),
        pts1=pts1, pts2=pts2, transform=transform,
    )
    print("nyu_crop.npz", cropped.shape)


def golden_softargmax() -> None:
    from network.util_modules import (
        RecoverXYZCoordinateFromHeatmap, HeatmapVariance)

    rng = np.random.RandomState(23)
    uv_hms = rng.normal(0, 0.4, size=(3, 41, 16, 16)).astype(np.float32)
    d_hms = rng.normal(0.4, 0.2, size=(3, 41, 16, 16)).astype(np.float32)
    rec = RecoverXYZCoordinateFromHeatmap(16, 16, 0.01)
    hv = HeatmapVariance(16, 16)
    with torch.no_grad():
        xyz = rec(torch.from_numpy(uv_hms), torch.from_numpy(d_hms))
        var = hv(torch.from_numpy(uv_hms))
    np.savez_compressed(
        os.path.join(OUT_DIR, "softargmax.npz"),
        uv_hms=uv_hms, d_hms=d_hms, xyz=xyz.numpy(), variance=var.numpy(),
    )
    print("softargmax.npz", xyz.shape)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    mesh = _load_mesh()
    golden_fk(mesh)
    golden_lbs(mesh)
    golden_hourglass()
    golden_pose_vae()
    golden_pose_denoiser()
    golden_sphere_render(mesh)
    golden_heatmap_render(mesh)
    golden_geometric_losses(mesh)
    golden_multiview(mesh)
    golden_multiview_extras(mesh)
    golden_softargmax()
    golden_nyu_crop()


if __name__ == "__main__":
    main()
