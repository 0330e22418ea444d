"""Driver entry points (__graft_entry__.py) exercised inside the suite.

VERDICT r2: the multi-chip dry run was only ever invoked by the driver, so a
stale failure (r1's mesh-shape assert) surfaced outside CI. The subprocess
re-exec inside dryrun_multichip pins JAX_PLATFORMS=cpu + the forced device
count itself, so this is safe under any pytest platform configuration.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    import jax

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 41, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dryrun_multichip_8_devices():
    # Raises on any failure (subprocess rc != 0); success means the full
    # combined train step compiled and executed over an 8-device data mesh.
    graft.dryrun_multichip(8)
