"""Native C++ loader vs the numpy reference path (decode + crop parity)."""
import numpy as np
import pytest

from spherehand_tpu.data import native
from spherehand_tpu.data.nyu import CameraIntrinsics, crop_depth_map

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not buildable here"
)


def _write_depth_png(path, depth):
    """Encode uint16 depth into the NYU RGB scheme (G<<8 | B)."""
    from PIL import Image

    d = depth.astype(np.uint16)
    rgb = np.zeros(d.shape + (3,), np.uint8)
    rgb[..., 1] = (d >> 8).astype(np.uint8)
    rgb[..., 2] = (d & 0xFF).astype(np.uint8)
    Image.fromarray(rgb).save(path)


@pytest.fixture(scope="module")
def fake_scene(tmp_path_factory):
    rng = np.random.RandomState(0)
    depth = rng.randint(400, 1500, (480, 640)).astype(np.float32)
    depth[200:280, 300:380] = rng.randint(820, 900, (80, 80))
    path = str(tmp_path_factory.mktemp("png") / "depth_1_0000001.png")
    _write_depth_png(path, depth)
    return path, depth


def test_decode_matches_python(fake_scene):
    path, depth = fake_scene
    decoded = native.decode_depth_png(path)
    np.testing.assert_array_equal(decoded, depth)


def test_crop_matches_numpy(fake_scene):
    _, depth = fake_scene
    center = np.asarray([40.0, -30.0, 860.0], np.float32)
    ref = crop_depth_map(depth, center, CameraIntrinsics())
    ours = native.crop_depth(depth, center)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_batch_decode_crop(fake_scene):
    path, depth = fake_scene
    centers = np.asarray(
        [[40.0, -30.0, 860.0], [0.0, 0.0, 860.0]], np.float32
    )
    crops, failures = native.decode_crop_batch([path, path], centers)
    assert failures == 0
    ref0 = crop_depth_map(depth, centers[0], CameraIntrinsics())
    np.testing.assert_allclose(crops[0], ref0, atol=1e-4)
    # missing file counts as failure, output stays background
    crops2, failures2 = native.decode_crop_batch(
        [path, "/nonexistent.png"], centers
    )
    assert failures2 == 1
    assert (crops2[1] == 100.0).all()


def test_generator_native_matches_python(tmp_path):
    """Full generator: native and python paths produce identical shards."""
    import scipy.io as sio

    from spherehand_tpu.data.nyu import NyuDatasetGenerator, NyuDataset

    rng = np.random.RandomState(3)
    n, views = 3, 3
    src = tmp_path / "train"
    src.mkdir()
    joint_xyz = np.zeros((views, n, 36, 3), np.float32)
    for v in range(views):
        for i in range(n):
            depth = rng.randint(500, 1400, (480, 640)).astype(np.float32)
            depth[180:300, 260:420] = rng.randint(820, 900, (120, 160))
            _write_depth_png(str(src / f"depth_{v + 1}_{i + 1:07d}.png"), depth)
            joints = rng.uniform(-60, 60, (36, 3)).astype(np.float32)
            joints[:, 2] += 860.0
            joints[32] = [20.0, 10.0, 860.0]
            joint_xyz[v, i] = joints
    # NYU convention stores y pre-flip; the generator flips it (:32).
    mat = {"joint_xyz": joint_xyz * np.asarray([1, -1, 1], np.float32)}
    sio.savemat(str(src / "joint_data.mat"), mat)

    gen = NyuDatasetGenerator(str(tmp_path), "train")
    gen.generate(samples_per_shard=2, use_native=True)
    ds_native = NyuDataset(str(tmp_path / "npy-64" / "train"))
    native_batch = ds_native.gather(np.arange(n))

    gen2 = NyuDatasetGenerator(str(tmp_path), "train")
    gen2.npy_dir = str(tmp_path / "npy-py")
    import os

    os.makedirs(gen2.npy_dir, exist_ok=True)
    gen2.generate(samples_per_shard=2, use_native=False, workers=2)
    ds_py = NyuDataset(gen2.npy_dir)
    py_batch = ds_py.gather(np.arange(n))

    for a, b in zip(native_batch, py_batch):
        np.testing.assert_allclose(a, b, atol=1e-4)
