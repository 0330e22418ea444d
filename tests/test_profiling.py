"""StepTimer windowing behavior."""
import numpy as np

from spherehand_tpu.utils.profiling import StepTimer


def test_step_timer_windows():
    timer = StepTimer(window=5)
    closed = [timer.tick(None) for _ in range(12)]
    # first tick arms the timer; every 5th step after closes a window
    assert closed.count(True) == 2
    assert timer.steps_per_sec > 0
