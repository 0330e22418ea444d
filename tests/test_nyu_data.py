"""NYU data pipeline: crop/Kabsch parity with the reference, shard I/O."""
import numpy as np

from spherehand_tpu.data.nyu import (
    CameraIntrinsics,
    NyuDataset,
    NyuLoader,
    crop_depth_map,
    kabsch_transform,
)


def test_crop_matches_reference_golden(goldens):
    g = goldens("nyu_crop")
    cropped = crop_depth_map(g["dm"], g["center"], CameraIntrinsics())
    np.testing.assert_allclose(cropped, g["cropped"], atol=1e-4)


def test_kabsch_matches_reference_golden(goldens):
    g = goldens("nyu_crop")
    t = kabsch_transform(g["pts1"], g["pts2"])
    np.testing.assert_allclose(t, g["transform"], atol=1e-8)
    # translation lives in row [3, :3] (the reference's convention)
    assert abs(t[3, :3]).sum() > 0
    np.testing.assert_allclose(t[:3, 3], 0.0)
    # and it actually maps pts1 onto pts2 (row-vector convention)
    mapped = g["pts1"] @ t[:3, :3].T + t[3, :3]
    np.testing.assert_allclose(mapped, g["pts2"], atol=1e-8)


def _write_fake_shards(tmp_path, num_samples=5, shard_size=3):
    from spherehand_tpu.data.nyu import NyuDatasetGenerator

    rng = np.random.RandomState(0)
    d = tmp_path / "train"
    d.mkdir(parents=True)
    gen = object.__new__(NyuDatasetGenerator)  # use only _write_shard
    gen.npy_dir = str(d)
    start = 0
    shard = 0
    while start < num_samples:
        n = min(shard_size, num_samples - start)
        dms = rng.uniform(20, 100, (n, 3, 64, 64)).astype(np.float32)
        joints = rng.uniform(-80, 80, (n, 3, 36, 3)).astype(np.float32)
        poses = np.tile(np.eye(4, dtype=np.float32), (n, 3, 1, 1))
        gen._write_shard(f"mv_data_{shard}", dms, joints, poses)
        start += n
        shard += 1
    return str(d)


def test_dataset_and_loader_roundtrip(tmp_path):
    d = _write_fake_shards(tmp_path)
    ds = NyuDataset(d)
    assert len(ds) == 5
    dms, joints, poses, inv_poses = ds.gather(np.asarray([0, 3, 4]))
    assert dms.shape == (3, 3, 64, 64)
    assert joints.shape == (3, 3, 36, 3)
    np.testing.assert_allclose(
        np.einsum("bvij,bvjk->bvik", poses, inv_poses),
        np.tile(np.eye(4, dtype=np.float32), (3, 3, 1, 1)),
        atol=1e-5,
    )
    loader = NyuLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 2  # 5 // 2, ragged tail dropped
    assert batches[0][0].shape == (2, 3, 64, 64)
