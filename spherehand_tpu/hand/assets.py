"""Hand model assets as an immutable JAX pytree.

The reference loads a Python pickle at import time and spreads its contents
across many ``nn.Module`` buffers (``network/constants.py:4-8``,
``mesh/pointTransformation.py:25-36``). Here the whole model is one frozen
dataclass of device arrays, loaded once from ``assets/hand_model.npz``
(produced by ``tools/convert_assets.py``) and passed explicitly into the pure
kinematics/rendering/loss functions.

Model facts (reference mesh/preprocess.py): 10,144 homogeneous vertices,
3,382 triangles, 17 bones (metacarpals, carpals, 5 fingers x 3 joints), and
41 skinned sphere keypoints with fixed radii (11 palm + 6 per finger).
"""
from __future__ import annotations

import os

import numpy as np
from flax import struct

import jax.numpy as jnp

DEFAULT_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "assets")


@struct.dataclass
class HandModel:
    """Static hand-model arrays. All fields are jnp arrays (pytree leaves).

    ``skin_matrix`` fuses skinning weights and rest vertices so full-mesh LBS
    becomes a single MXU matmul: ``skin_matrix[(j*4+n), v] = W[j,v] * rest[v,n]``
    and ``skinned[b,m,v] = sum_{j,n} T[b,j,m,n] * skin_matrix[(j*4+n), v]``.
    This replaces the reference's per-bone matmul + reduce
    (mesh/pointTransformation.py:39-46) with one (B*4, 68) @ (68, V) contraction.
    """

    vertices: jnp.ndarray      # (V, 4) homogeneous rest vertices
    faces: jnp.ndarray         # (F, 3) int32, raster winding (right-hand swapped)
    offset_mats: jnp.ndarray   # (17, 4, 4) bone offset (world -> bone-local at rest)
    inv_offset_mats: jnp.ndarray  # (17, 4, 4)
    skin_weights: jnp.ndarray  # (17, V) dense skinning weights
    skin_matrix: jnp.ndarray   # (68, V) fused weights x rest vertices
    kp_local: jnp.ndarray      # (41, 4) sphere centers in rest pose (homogeneous)
    kp_bone: jnp.ndarray       # (41,) int32 owning bone per sphere
    kp_radius: jnp.ndarray     # (41,) sphere radii, mm
    # (68, 3*F) = skin_matrix[:, faces.flat]: LBS directly in FACE-VERTEX
    # order. The mesh is a near-soup (V ~ 3F), so the former per-image
    # projected[:, faces.flat] gather cost ~1.5 ms/call at B=1024 — baking
    # the permutation into the matmul columns makes face assembly a free
    # reshape (bit-identical: each output column's dot product is unchanged).
    skin_matrix_faces: jnp.ndarray = None
    right_hand: bool = struct.field(pytree_node=False, default=True)
    # Validated rasterizer truncation bound for THIS mesh (fraction of faces
    # the sorted record buffer keeps; see raster_pallas.nondump_counts). It is
    # a per-mesh measured property, so it ships in the asset npz
    # (tools/convert_assets.py / tools/make_lite_mesh.py validate and write
    # it). 1.0 = no truncation — the safe default for meshes without a
    # validated bound.
    raster_valid_frac: float = struct.field(pytree_node=False, default=1.0)

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]

    @property
    def num_bones(self) -> int:
        return self.offset_mats.shape[0]

    @property
    def num_keypoints(self) -> int:
        return self.kp_local.shape[0]


def _fuse_skin_matrix(weights: np.ndarray, vertices: np.ndarray) -> np.ndarray:
    num_bones, num_verts = weights.shape
    # (17, V) x (V, 4) -> (17, 4, V) -> (68, V)
    fused = weights[:, None, :] * vertices.T[None, :, :]
    return fused.reshape(num_bones * 4, num_verts)


def load_hand_model(
    path: str | None = None,
    right_hand: bool = True,
    dtype: jnp.dtype = jnp.float32,
    lite: bool = False,
) -> HandModel:
    """Load ``hand_model.npz`` into a :class:`HandModel` pytree.

    The triangle index columns 0/1 are swapped for the right hand so winding
    stays front-facing after the LBS x-negation, matching the reference
    (mesh/render.py:298-300 and mesh/pointTransformation.py:44-45).

    lite=True loads ``hand_model_lite.npz`` (tools/make_lite_mesh.py): the
    half-edge-collapsed mesh restricted to face-referenced vertices — same
    bones/keypoints/spheres, ~half the triangles and ~12x fewer LBS columns.
    Depth renders are validated sub-output-pixel vs the full mesh; use it for
    synthetic training-data generation, not for CUDA-parity comparisons.
    """
    if path is None:
        name = "hand_model_lite.npz" if lite else "hand_model.npz"
        path = os.path.join(DEFAULT_ASSET_DIR, name)
    raw = np.load(path, allow_pickle=False)
    vertices = raw["vertices"].astype(np.float32)
    faces = raw["faces"].astype(np.int32)
    if right_hand:
        faces = faces[:, [1, 0, 2]]
    offset = raw["offset_mats"].astype(np.float32)
    weights = raw["skin_weights"].astype(np.float32)
    flat = faces.reshape(-1)
    return HandModel(
        skin_matrix_faces=jnp.asarray(
            _fuse_skin_matrix(weights[:, flat], vertices[flat]), dtype
        ),
        vertices=jnp.asarray(vertices, dtype),
        faces=jnp.asarray(faces),
        offset_mats=jnp.asarray(offset, dtype),
        inv_offset_mats=jnp.asarray(np.linalg.inv(offset.astype(np.float64)).astype(np.float32), dtype),
        skin_weights=jnp.asarray(weights, dtype),
        skin_matrix=jnp.asarray(_fuse_skin_matrix(weights, vertices), dtype),
        kp_local=jnp.asarray(raw["kp_local"].astype(np.float32), dtype),
        kp_bone=jnp.asarray(raw["kp_bone"].astype(np.int32)),
        kp_radius=jnp.asarray(raw["kp_radius"].astype(np.float32), dtype),
        right_hand=right_hand,
        raster_valid_frac=float(raw["raster_valid_frac"])
        if "raster_valid_frac" in raw.files else 1.0,
    )


def load_pose_prior_pca(path: str | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """PCA pose prior (mean, components) — reference mesh/model/pose_prior.pkl."""
    if path is None:
        path = os.path.join(DEFAULT_ASSET_DIR, "pose_prior_pca.npz")
    raw = np.load(path)
    return jnp.asarray(raw["mean"]), jnp.asarray(raw["components"])
