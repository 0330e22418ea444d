"""Device-resident data path: batches gathered inside the jitted step must
reproduce the host loader path exactly (same index plan, exact gathers), for
the combined K=1 / scan-K / eval paths, on the simulated 8-device mesh.

Also pins the loader's epoch-shuffle semantics: the reference DataLoader
(shuffle=True) draws a fresh permutation each epoch; ours derives it from
(seed, epoch) so resumed runs replay the same orders.
"""
import dataclasses
import json
import os

import numpy as np
import pytest

from spherehand_tpu.train.config import EngineConfig

from test_engine import _write_fake_nyu


def _mk_cfg(tmp_path, **kw):
    return EngineConfig(
        mode="Train",
        model_dir=str(tmp_path / (
            f"runs_{kw.get('device_data', 'auto')}"
            f"_{kw.get('steps_per_call', 1)}"
        )),
        dataset_dir=str(tmp_path / "nyu"),
        epoch=1,
        num_stacks=1,
        real_batch=3,   # 3 % 8 != 0 -> exercises the padded-index path
        synt_batch=4,
        eval_batch=3,
        tag="t_",
        **kw,
    )


def _losses(run_dir):
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    return [r for r in recs if r["mode"] == "both"]


@pytest.mark.slow
def test_device_data_matches_host_loader(tmp_path):
    from spherehand_tpu.train.engine import Engine

    _write_fake_nyu(str(tmp_path / "nyu"), "train", num_samples=7)
    _write_fake_nyu(str(tmp_path / "nyu"), "test", num_samples=5)

    runs = {}
    for mode in ("off", "on"):
        eng = Engine(_mk_cfg(tmp_path, device_data=mode))
        eng._epoch_combined(0)
        ev = eng._epoch_real_eval(0)
        runs[mode] = (_losses(eng.model_path), ev)

    host, dev = runs["off"], runs["on"]
    assert len(host[0]) == len(dev[0]) > 0
    for h, d in zip(host[0], dev[0]):
        for k in h:
            if isinstance(h[k], float):
                np.testing.assert_allclose(h[k], d[k], rtol=2e-6, atol=1e-7,
                                           err_msg=k)
    for k, v in host[1].items():
        np.testing.assert_allclose(v, dev[1][k], rtol=2e-6, atol=1e-7,
                                   err_msg=k)


@pytest.mark.slow
def test_device_data_scan_path_matches(tmp_path):
    from spherehand_tpu.train.engine import Engine

    _write_fake_nyu(str(tmp_path / "nyu"), "train", num_samples=7)
    _write_fake_nyu(str(tmp_path / "nyu"), "test", num_samples=5)

    # K=2 over 2 full dispatches; batch 3 over 7 samples -> 2 steps + no tail
    runs = {}
    for mode in ("off", "on"):
        eng = Engine(_mk_cfg(tmp_path, device_data=mode, steps_per_call=2))
        eng._epoch_combined(0)
        runs[mode] = _losses(eng.model_path)

    assert len(runs["off"]) == len(runs["on"]) > 0
    for h, d in zip(runs["off"], runs["on"]):
        for k in h:
            if isinstance(h[k], float):
                np.testing.assert_allclose(h[k], d[k], rtol=2e-6, atol=1e-7,
                                           err_msg=k)


def test_loader_shuffles_fresh_each_epoch(tmp_path):
    from spherehand_tpu.data.nyu import NyuDataset, NyuLoader

    _write_fake_nyu(str(tmp_path / "nyu"), "train", num_samples=16)
    ds = NyuDataset(os.path.join(str(tmp_path / "nyu"), "train"))

    def order(epoch, seed=3):
        loader = NyuLoader(ds, batch_size=4, shuffle=True, seed=seed,
                           epoch=epoch)
        return np.concatenate(list(loader.iter_index_batches()))

    e0, e1 = order(0), order(1)
    assert not np.array_equal(e0, e1)          # fresh permutation per epoch
    np.testing.assert_array_equal(e0, order(0))  # resume-stable
    assert not np.array_equal(e0, order(0, seed=4))  # seed-sensitive
    np.testing.assert_array_equal(np.sort(e0), np.arange(16))
