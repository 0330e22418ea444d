"""``python -m spherehand_tpu`` == the training/eval CLI.

Mirrors the reference entry point ``python network/run_engine.py``
(run_engine.py:1-35); all flags in :mod:`spherehand_tpu.train.cli`.
"""
from spherehand_tpu.train.cli import main

main()
