"""CLI flag-compatibility tests (reference run_engine.py semantics)."""
import pytest

from spherehand_tpu.train.cli import build_parser, config_from_args


def test_default_flags_match_reference():
    args = build_parser().parse_args([])
    cfg = config_from_args(args)
    # default-on store_false toggles (run_engine.py:10-16)
    assert cfg.synthesize and cfg.mv_projection and cfg.mv_consistency
    assert cfg.prior and cfg.collision and cfg.bone_length
    assert not cfg.temporal
    assert cfg.mode == "Test"
    assert cfg.num_stacks == 1 and cfg.epoch == 75 and cfg.lr == 1e-3
    assert cfg.with_real


def test_store_false_toggles_disable():
    args = build_parser().parse_args(["--synthesize", "--mv_projection"])
    cfg = config_from_args(args)
    assert not cfg.synthesize
    assert not cfg.mv_projection
    assert cfg.mv_consistency  # untouched


def test_synthetic_only_configuration():
    flags = [
        "--mv_projection", "--mv_consistency", "--prior",
        "--collision", "--bone_length", "--mode", "Train",
    ]
    cfg = config_from_args(build_parser().parse_args(flags))
    assert cfg.synthesize and not cfg.with_real


def test_test_mode_requires_model():
    from spherehand_tpu.train.cli import main

    with pytest.raises(SystemExit):
        main(["--mode", "Test"])
