"""Converter key-name manifests (VERDICT r3 next-round #7).

Each family has a committed manifest (tests/manifests/<family>_keys.json,
provenance cited inside) of the diffusers state-dict key names its
converter expects.  These tests pin three things without real weights:

  1. the synthetic state-dict builders produce EXACTLY the manifest's
     key set (no builder-invented names can drift in silently),
  2. ``convert_strict`` consumes EVERY key (an unconsumed tensor is the
     silent failure mode a real checkpoint load would hit),
  3. unknown and missing keys fail loudly.
"""

import json
import os

import numpy as np
import pytest

import test_weights as tw
from rectified_spaattn_tpu.models.wan import WanConfig
from rectified_spaattn_tpu.models.hunyuan import HunyuanVideoConfig
from rectified_spaattn_tpu.models.flux import FluxConfig, FluxControlNetConfig
from rectified_spaattn_tpu.models.cogvideox import CogVideoXConfig
from rectified_spaattn_tpu.models.weights import convert_strict

MANIFEST_DIR = os.path.join(os.path.dirname(__file__), "manifests")


def expand_manifest(family: str, counts: dict) -> set:
    with open(os.path.join(MANIFEST_DIR, f"{family}_keys.json")) as f:
        m = json.load(f)
    keys = set(m["static"])
    for group, spec in m["per_block"].items():
        n = counts[group]
        for i in range(n):
            for suffix in spec["keys"]:
                keys.add(f"{spec['prefix']}.{i}.{suffix}")
    return keys


def build_case(family: str):
    rng = np.random.default_rng(7)
    if family == "wan":
        cfg = WanConfig.tiny()
        sd = tw.synth_wan_sd(cfg, rng)
        return sd, {"blocks": cfg.num_blocks}, (cfg.num_blocks,), {}
    if family == "hunyuan":
        cfg = HunyuanVideoConfig.tiny()
        sd = tw.synth_hunyuan_sd(cfg, rng)
        return (sd,
                {"refiner": cfg.num_refiner_blocks,
                 "dual": cfg.num_dual_blocks,
                 "single": cfg.num_single_blocks},
                (cfg.num_dual_blocks, cfg.num_single_blocks,
                 cfg.num_refiner_blocks, cfg.pooled_dim, cfg.text_dim), {})
    if family == "flux":
        cfg = FluxConfig.tiny()
        sd = tw.synth_flux_sd(cfg, rng)
        return (sd, {"dual": cfg.num_dual_blocks,
                     "single": cfg.num_single_blocks},
                (cfg.num_dual_blocks, cfg.num_single_blocks), {})
    if family == "flux_controlnet":
        cfg = FluxControlNetConfig.tiny()
        sd = tw.synth_flux_controlnet_sd(cfg, rng)
        # a real FluxControlNetModel state dict has no trunk output head
        # (the fixture reuses synth_flux_sd, which adds one)
        for k in ("norm_out.linear.weight", "norm_out.linear.bias",
                  "proj_out.weight", "proj_out.bias"):
            sd.pop(k, None)
        return (sd,
                {"dual": cfg.num_dual_blocks,
                 "single": cfg.num_single_blocks,
                 "cn_dual": cfg.num_dual_blocks,
                 "cn_single": cfg.num_single_blocks},
                (cfg.num_dual_blocks, cfg.num_single_blocks), {})
    if family == "cogvideox":
        cfg = CogVideoXConfig.tiny()
        sd = tw.synth_cog_sd(cfg, rng)
        return sd, {"blocks": cfg.num_blocks}, (cfg.num_blocks,), {}
    raise ValueError(family)


FAMILIES = ["wan", "hunyuan", "flux", "flux_controlnet", "cogvideox"]


@pytest.mark.parametrize("family", FAMILIES)
def test_synthetic_sd_matches_manifest(family):
    sd, counts, _, _ = build_case(family)
    want = expand_manifest(family, counts)
    got = set(sd)
    assert got == want, (
        f"builder-invented: {sorted(got - want)[:6]} "
        f"manifest-only: {sorted(want - got)[:6]}")


@pytest.mark.parametrize("family", FAMILIES)
def test_convert_strict_consumes_every_key(family):
    sd, _, args, kwargs = build_case(family)
    out = convert_strict(family, sd, *args, **kwargs)
    assert "params" in out


@pytest.mark.parametrize("family", FAMILIES)
def test_unknown_key_fails_loudly(family):
    sd, _, args, kwargs = build_case(family)
    sd["transformer_blocks.0.attn.to_q.lora_A.weight"] = np.zeros(
        (4, 4), np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        convert_strict(family, sd, *args, **kwargs)


@pytest.mark.parametrize("family", FAMILIES)
def test_missing_key_fails_loudly(family):
    sd, _, args, kwargs = build_case(family)
    victim = sorted(k for k in sd if k.endswith(".to_q.weight"))[0]
    del sd[victim]
    with pytest.raises(KeyError):
        convert_strict(family, sd, *args, **kwargs)
