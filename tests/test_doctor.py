"""tools/doctor.py must pass end to end on a fresh checkout (CPU mode).

Guards the doctor against API drift in the modules it exercises — its whole
value is that a new user can trust its verdict."""
import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


@pytest.mark.slow
def test_doctor_cpu_passes():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # doctor --cpu pins the platform itself
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "doctor.py"), "--cpu"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "7/7 checks passed" in proc.stdout, proc.stdout
