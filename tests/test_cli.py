"""CLI surface: every Config field is a flag; subcommands dispatch.

The reference is configured by editing config.py; the CLI replaces
that, so flag->Config fidelity is a user-facing contract."""

import dataclasses

from dsf_tpu.config import Config
from dsf_tpu.training.__main__ import main, parse_config


def test_defaults_roundtrip():
    cfg = parse_config([])
    assert cfg == Config()


def test_every_field_is_a_flag():
    import argparse
    # would raise SystemExit on an unknown flag
    for f in dataclasses.fields(Config):
        parse_config([f"--{f.name}", str(getattr(Config(), f.name))
                      if not isinstance(f.default, tuple)
                      else ",".join(map(str, f.default))])


def test_typed_parsing():
    cfg = parse_config([
        "--dataset", "msra", "--batch_size", "64", "--lr", "3e-4",
        "--mask", "false", "--save_mesh", "yes",
        "--augment_para", "5,0.1,90", "--feature_type", "offset",
        "--stage_num", "1", "--compute_dtype", "bfloat16"])
    assert cfg.dataset == "msra" and cfg.batch_size == 64
    assert cfg.lr == 3e-4 and cfg.mask is False and cfg.save_mesh is True
    assert cfg.augment_para == (5.0, 0.1, 90.0)
    assert cfg.feature_type == ("offset",)
    assert cfg.stage_num == 1 and cfg.compute_dtype == "bfloat16"
    # derived tables follow the dataset (ref config.py:1-28)
    assert cfg.joint_num == 21 and cfg.cube_size == (200, 200, 200)


def test_subcommand_dispatch(monkeypatch):
    calls = {}
    from dsf_tpu.training import pipelines

    monkeypatch.setattr(pipelines, "run_ccssl",
                        lambda cfg: calls.setdefault("ccssl", cfg))
    monkeypatch.setattr(pipelines, "run_cyclegan",
                        lambda cfg: calls.setdefault("cyclegan", cfg))
    main(["ccssl", "--dataset", "nyu", "--batch_size", "4"])
    main(["cyclegan", "--lr", "2e-4"])
    assert calls["ccssl"].batch_size == 4
    assert calls["cyclegan"].lr == 2e-4


def test_train_dispatch(monkeypatch):
    seen = {}
    import dsf_tpu.training.loop as loop

    monkeypatch.setattr(loop, "run", lambda cfg: seen.setdefault("cfg", cfg))
    main(["--phase", "test", "--dataset", "icvl"])
    assert seen["cfg"].phase == "test" and seen["cfg"].dataset == "icvl"
