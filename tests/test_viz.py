"""Visualization grid smoke tests (host-side, cv2)."""
import numpy as np

from spherehand_tpu import viz


def test_result_grid_shapes():
    rng = np.random.RandomState(0)
    dms = rng.uniform(-1, 1, (2, 64, 64)).astype(np.float32)
    hms = rng.uniform(0, 1, (2, 41, 16, 16)).astype(np.float32)
    joints = rng.uniform(-100, 100, (2, 41, 3)).astype(np.float32)
    img = viz.result_grid(dms, hms, joints)
    assert img.shape == (2 * 128, 3 * 128, 3)
    assert img.dtype == np.uint8
    # with vis_indices subset and resized base
    img2 = viz.result_grid(
        dms, hms, joints, vis_indices=[0, 5, 40], resized_dms=dms
    )
    assert img2.shape == (2 * 128, 3 * 128, 3)


def test_depthmap_to_u8_range():
    dm = np.asarray([[-2.0, 0.0], [1.0, 2.0]], np.float32)
    out = viz.depthmap_to_u8(dm)
    assert out[0, 0, 0] == 0 and out[1, 1, 0] == 254
