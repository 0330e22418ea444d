"""Evaluation: joint-error metrics, PCK curves, offline evaluation driver."""
