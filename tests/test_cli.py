"""CLI surface tests: flag vocabulary parity with the reference drivers."""

import pytest

from rectified_spaattn_tpu.cli.generate import (
    parse_args, DEFAULTS, MODEL_CHOICES)


def test_reference_flag_vocabulary():
    args = parse_args([
        "--model", "hunyuan", "--height", "720", "--width", "1280",
        "--frame", "128", "--num_steps", "50", "--sa_drop_rate", "0.8",
        "--p_remain_rates", "0.3", "--enable_teacache",
        "--rel_l1_thresh", "0.15", "--mode", "sparse"])
    assert args.sa_drop_rate == 0.8
    assert args.enable_teacache
    assert args.teacache_thresh == 0.15
    assert args.mode == "sparse"


def test_teacache_thresh_alias():
    # wan drivers use --teacache_thresh, hunyuan uses --rel_l1_thresh
    a = parse_args(["--teacache_thresh", "0.2"])
    b = parse_args(["--rel_l1_thresh", "0.2"])
    assert a.teacache_thresh == b.teacache_thresh == 0.2


def test_defaults_cover_every_model():
    assert set(DEFAULTS) == set(MODEL_CHOICES)
    # reference operating points (scripts/Inference.md)
    assert DEFAULTS["hunyuan"] == (0.8, 0.15)
    assert DEFAULTS["wan21-t2v"] == (0.75, 0.2)
    assert DEFAULTS["flux-upscale"] == (0.9, 0.8)


def test_use_ret_steps_flag():
    args = parse_args(["--model", "wan21-t2v", "--use_ret_steps"])
    assert args.use_ret_steps


def test_all_modes_accepted():
    for mode in ("sparse", "flash", "torch", "vanilla"):
        assert parse_args(["--mode", mode]).mode == mode
