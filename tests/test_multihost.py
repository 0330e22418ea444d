"""Multi-host data parallelism, tested for real (VERDICT r2 #2).

Spawns a 2-process ``jax.distributed`` CPU cluster (gloo collectives, 4
forced devices per process = 8 global) and drives the engine's per-host
input-sharding paths — ``_put_batch`` (per-step) and ``_put_batches``
(steps_per_call > 1, newly wired) — with different data per host. See
tests/multihost_child.py for the in-cluster assertions; here we check both
processes succeed and report IDENTICAL losses (replicated params => the
psum-reduced update must agree across hosts).
"""
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_engine_combined_and_scan(tmp_path):
    child = os.path.join(os.path.dirname(__file__), "multihost_child.py")
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        # the parent pytest pins a different forced-device count; children
        # set their own platform env before importing jax
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, out[-2000:]

    def losses(out):
        return [
            line.split()[1]
            for line in out.splitlines()
            if line.startswith(("LOSS_STEP", "LOSS_SCAN"))
        ]

    l0, l1 = losses(outs[0]), losses(outs[1])
    assert len(l0) == 2
    assert l0 == l1, (l0, l1)  # replicated state: losses agree across hosts
