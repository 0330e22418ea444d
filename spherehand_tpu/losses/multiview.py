"""Multi-view self-supervision: mutual projection and consistency losses.

Re-design of the reference's ``mesh/multiview_utility.py`` (MutualTransformation
:9-30, MutualProjection :32-77, MutualProjectionLoss :80-130,
MultiviewConsistencyLoss :133-167, FuseMvPose :203-237) as pure functions. The
reference assembles the V x V transform grid with Python loops and ``repeat``;
here it is one batched einsum, and the (B, V, V, J) sphere render rides the
broadcast renderer. Camera-pose quirk preserved: translations are read from
column [:3, 3], which the NYU generator leaves ~0 (it writes Kabsch
translations into row [3, :3]; see SURVEY.md §5) — cross-view transforms are
effectively rotation-only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from spherehand_tpu.ops.softargmax import heatmap_variance
from spherehand_tpu.render.sphere import data_to_model_distance, render_spheres

_HIGHEST = jax.lax.Precision.HIGHEST


def mutual_transforms(poses: jnp.ndarray, inv_poses: jnp.ndarray) -> jnp.ndarray:
    """All-pairs view transforms: out[b, i, j] = inv_poses[b, j] @ poses[b, i].

    poses: (B, V, 4, 4). Returns (B, V, V, 4, 4), the transform taking view-i
    coordinates into view j (reference multiview_utility.py:13-30).
    """
    return jnp.einsum(
        "bjmn,binl->bijml", inv_poses, poses, precision=_HIGHEST
    )


def apply_rigid(mats: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) rigid transforms to (..., N, 3) points.

    Rotation from [:3, :3], translation from column [:3, 3] — the convention
    every multiview loss in the reference uses (multiview_utility.py:71,153).
    """
    rotated = jnp.einsum(
        "...mn,...jn->...jm", mats[..., :3, :3], points, precision=_HIGHEST
    )
    return rotated + mats[..., None, :3, 3]


def mutual_projection(
    poses: jnp.ndarray,
    inv_poses: jnp.ndarray,
    joints: jnp.ndarray,
    radii: jnp.ndarray,
    size: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Render every view's estimated spheres into every other view.

    joints: (B, V, J, 3) per-view joint estimates in mm. Returns
    (depth_maps (B, V, V, size, size), projected_joints (B, V, V, J, 3)) where
    [b, i, j] holds view i's joints expressed/rendered in view j's camera
    (reference multiview_utility.py:55-77). The view transforms carry no
    gradient (:68).
    """
    mats = jax.lax.stop_gradient(mutual_transforms(poses, inv_poses))
    projected = apply_rigid(mats, joints[:, :, None])
    # projected: (B, V, V, J, 3)
    from spherehand_tpu.render.sphere import _fuse_spheres

    if _fuse_spheres(size):
        # Fused Pallas min-depth render: no (B, V, V, J, S, S) intermediate
        # in either pass (render/sphere_pallas.py; ~2 ms/step at the
        # reference geometry).
        from spherehand_tpu.render.sphere_pallas import sphere_min_depth

        b, vi, vj, num_j, _ = projected.shape
        depth_maps = sphere_min_depth(
            projected.reshape(b * vi * vj, num_j, 3), radii, size
        ).reshape(b, vi, vj, size, size)
    else:
        part_maps = render_spheres(projected, radii, size)  # (B,V,V,J,S,S)
        depth_maps = jnp.min(part_maps, axis=-3)
    return depth_maps, projected


def mutual_projection_loss(
    poses: jnp.ndarray,
    inv_poses: jnp.ndarray,
    joints: jnp.ndarray,
    real_dms: jnp.ndarray,
    radii: jnp.ndarray,
    is_mv: bool | jnp.ndarray = True,
    weights: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Model<->data alignment across views (multiview_utility.py:90-130).

    real_dms: (B, V, H, W) observed depth in mm (background 100). When
    ``is_mv`` the loss covers all V x V pairs (x9); otherwise only the
    own-view diagonal (x3). Model-to-data is plain MSE of the rendered sphere
    depth against the observation; data-to-model is the point-to-sphere
    distance field; total = m2d + 500 * d2m. ``is_mv`` may be a traced bool —
    both branches are computed and selected, keeping the step jittable.
    ``weights`` (B,) zeroes padded data-parallel rows (ops.reduce).

    Returns (loss, projected_dms (B, V, V, H, W)).
    """
    from spherehand_tpu.ops.reduce import bmean, bmean_keep
    from spherehand_tpu.render.sphere import _fuse_spheres

    size = real_dms.shape[-1]
    num_views = real_dms.shape[1]
    diag = jnp.arange(num_views)

    if _fuse_spheres(size):
        # One fused kernel pass produces BOTH loss fields (render min-depth
        # + nearest-surface distance) of the same projected sphere set, and
        # its custom VJP emits the summed centers gradient in one backward
        # launch (render/sphere_pallas.py sphere_min_depth_and_d2m). The sv
        # branch consumes the diagonal of the SAME distance field — the
        # three per-view d2m kernel calls the unfused path needs vanish.
        from spherehand_tpu.render.sphere_pallas import sphere_min_depth_and_d2m

        mats = jax.lax.stop_gradient(mutual_transforms(poses, inv_poses))
        projected_joints = apply_rigid(mats, joints[:, :, None])
        b, vi, vj, num_j, _ = projected_joints.shape
        target = jnp.broadcast_to(
            real_dms[:, None], (b, vi, vj, size, size)
        )
        depth_flat, dist_flat = sphere_min_depth_and_d2m(
            projected_joints.reshape(b * vi * vj, num_j, 3),
            target.reshape(b * vi * vj, size, size),
            radii,
            size,
        )
        projected_dms = depth_flat.reshape(b, vi, vj, size, size)
        dist_field = jnp.clip(dist_flat.reshape(b, vi, vj, size, size), 0.0, 50.0)
        d2m_mv = bmean(dist_field, weights) * 9.0
        # diag slice [b, v, v] of the field == the own-view d2m term
        d2m_sv = jnp.sum(
            bmean_keep(dist_field[:, diag, diag], weights, (2, 3))
        ) * 3.0
    else:
        projected_dms, projected_joints = mutual_projection(
            poses, inv_poses, joints, radii, size
        )
        # target[b, i, j] = real_dms[b, j]
        target = jnp.broadcast_to(real_dms[:, None], projected_dms.shape)
        d2m_mv = data_to_model_distance(
            target, projected_joints, radii, weights
        ) * 9.0
        joints_diag = projected_joints[:, diag, diag]  # (B, V, J, 3)
        d2m_sv = (
            sum(
                data_to_model_distance(
                    real_dms[:, v], joints_diag[:, v], radii, weights
                )
                for v in range(num_views)
            )
            * 3.0
        )

    m2d_mv = bmean((projected_dms - target) ** 2, weights) * 9.0
    proj_diag = projected_dms[:, diag, diag]  # (B, V, H, W)
    target_diag = real_dms
    m2d_sv = jnp.sum(
        bmean_keep((proj_diag - target_diag) ** 2, weights, (2, 3))
    ) * 3.0

    loss_mv = m2d_mv + 500.0 * d2m_mv
    loss_sv = m2d_sv + 500.0 * d2m_sv
    loss = jnp.where(jnp.asarray(is_mv), loss_mv, loss_sv)
    return loss, projected_dms


def multiview_consistency_loss(
    poses: jnp.ndarray,
    joints: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """MSE of per-view canonical joints against their per-coordinate median.

    joints: (B, V, J, 3). Each view's estimate is mapped into the canonical
    frame; the target is the elementwise median over views (torch.median
    semantics: the LOWER middle value for even V), and the loss is the mean
    squared deviation of every view from it (multiview_utility.py:138-167).
    """
    from spherehand_tpu.ops.reduce import bmean

    canonical = apply_rigid(poses, joints)  # (B, V, J, 3)
    num_views = canonical.shape[1]
    med = jnp.sort(canonical, axis=1)[:, (num_views - 1) // 2]
    return bmean((med[:, None] - canonical) ** 2, weights)


def weighted_multiview_consistency_loss(
    poses: jnp.ndarray, joints: jnp.ndarray, hm_weight: jnp.ndarray
) -> jnp.ndarray:
    """Variant pulling every view toward the highest-confidence view.

    hm_weight: (B, V, J) per-joint confidences; the target is the canonical
    joint of the max-weight view, and the loss is the SUM of squared
    deviations (reference WeightedMultiviewConsistencyLoss,
    multiview_utility.py:170-201 — imported by the reference criterion but
    never constructed; provided for API parity).
    """
    canonical = apply_rigid(poses, joints)  # (B, V, J, 3)
    best_view = jnp.argmax(hm_weight, axis=1)  # (B, J)
    target = jnp.take_along_axis(
        canonical, best_view[:, None, :, None], axis=1
    )  # (B, 1, J, 3)
    return jnp.sum((target - canonical) ** 2)


def fuse_mv_pose(
    joints: jnp.ndarray,
    poses: jnp.ndarray,
    inv_poses: jnp.ndarray,
    uv_hms: jnp.ndarray,
) -> jnp.ndarray:
    """Pick the lowest-heatmap-variance view per joint, broadcast to all views.

    joints (B, V, J, 3); uv_hms (B, V, J, H, W). Canonicalize every view's
    estimate, select per joint the view whose heatmap has the smallest spatial
    variance (weight exp(-10 var)), then map that canonical point back through
    each view's inverse pose (reference multiview_utility.py:208-237; wired
    into the reference Engine but never invoked — provided for API parity).
    """
    canonical = apply_rigid(poses, joints)  # (B, V, J, 3)
    var = heatmap_variance(uv_hms)  # (B, V, J)
    weight = jax.lax.stop_gradient(jnp.exp(-10.0 * var))
    best_view = jnp.argmax(weight, axis=1)  # (B, J)
    picked = jnp.take_along_axis(
        canonical, best_view[:, None, :, None], axis=1
    )  # (B, 1, J, 3)
    return apply_rigid(inv_poses, picked)
