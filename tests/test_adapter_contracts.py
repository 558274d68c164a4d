"""Gated-adapter CONTRACT tests (VERDICT r2 item 7).

The VBench / VisionReward stacks are not installable here, so their
adapters' availability paths were the only tested paths.  These tests
mock the external APIs with recorders whose EXPECTED call shapes are
pinned from the vendored reference sources
(/root/reference/eval/video/vbench/run_vbench.py:46-60,
/root/reference/eval/video/VisionReward/inference-video.py:70-116), so
the only remaining unknown is stack availability, not our call sequence.
"""

import sys
import types

import numpy as np
import pytest

from rectified_spaattn_tpu.eval import quality


def test_vbench_adapter_call_sequence(monkeypatch, tmp_path):
    """Pin against run_vbench.py:46-60: one VBench PER dimension,
    constructed (device, full_info_path, save_path); evaluate called
    with videos_path/name/local=False/read_frame=False/dimension_list/
    mode='custom_input'/imaging_quality_preprocessing_mode='longer'."""
    constructed = []
    evaluated = []

    class FakeVBench:
        def __init__(self, device, full_info_path, save_path):
            constructed.append((str(device), full_info_path, save_path))

        def evaluate(self, **kw):
            evaluated.append(kw)

    mod = types.ModuleType("vbench")
    mod.VBench = FakeVBench
    monkeypatch.setitem(sys.modules, "vbench", mod)

    out = quality.run_vbench(str(tmp_path), full_info_path="prompts.json")
    assert out["available"] is True
    # reference constructs a fresh VBench per dimension (:51)
    assert len(constructed) == len(quality.VBENCH_DIMENSIONS)
    assert all(c == ("cpu", "prompts.json", str(tmp_path))
               for c in constructed)
    assert [e["name"] for e in evaluated] == list(quality.VBENCH_DIMENSIONS)
    for e in evaluated:
        assert e["videos_path"] == str(tmp_path)
        assert e["local"] is False                      # :54
        assert e["read_frame"] is False                 # :55
        assert e["dimension_list"] == [e["name"]]       # :56
        assert e["mode"] == "custom_input"              # :57
        assert e["imaging_quality_preprocessing_mode"] == "longer"  # :50


def test_vbench_dimension_list_matches_reference():
    # run_vbench.py:27-34
    assert quality.VBENCH_DIMENSIONS == (
        "subject_consistency", "imaging_quality", "background_consistency",
        "motion_smoothness", "aesthetic_quality", "dynamic_degree")


class _FakeTensor:
    """Minimal tensor stand-in supporting the adapter's unsqueeze/shape/
    indexing/to calls."""

    def __init__(self, val):
        self.val = val
        self.shape = (1, 4)

    def unsqueeze(self, i):
        return self

    def to(self, *a):
        return self

    def __getitem__(self, item):
        return self


def test_visionreward_adapter_call_sequence(monkeypatch):
    """Pin against inference-video.py:70-116: per (video, question)
    build_conversation_input_ids(tokenizer, query, images=[video],
    history=[], template_version='chat'); generate with the exact
    gen_kwargs (max_new_tokens=2048, pad_token_id=128002, top_k=1,
    do_sample=False, top_p=0.1, temperature=0.1); answer token decoded at
    input_ids.shape[1]; score = mean(weight * ±1)."""
    import torch

    built = []
    generated = []
    answers = iter(["yes", "no", "yes", "yes"])  # 2 questions x 2 videos

    class FakeModel:
        def build_conversation_input_ids(self, tokenizer, query, images,
                                         history, template_version):
            built.append({"query": query, "n_images": len(images),
                          "history": history,
                          "template_version": template_version})
            return {"input_ids": torch.zeros(4, dtype=torch.long),
                    "token_type_ids": torch.zeros(4, dtype=torch.long),
                    "attention_mask": torch.ones(4, dtype=torch.long),
                    "images": [torch.zeros(3, 2, 4, 4)]}

        def generate(self, **kw):
            generated.append({k: v for k, v in kw.items()
                              if k not in ("input_ids", "token_type_ids",
                                           "attention_mask", "images")})
            return torch.zeros((1, 8), dtype=torch.long)

    class FakeTok:
        def decode(self, ids):
            return next(answers)

    questions = ["Is [[prompt]] shown clearly?", "Is the motion smooth?"]
    weight = np.asarray([2.0, 1.0])
    monkeypatch.setattr(
        quality, "_visionreward_load",
        lambda: (FakeModel(), FakeTok(), questions, weight))
    monkeypatch.setattr(
        quality, "_sample_video_frames",
        lambda path, num_frames=24: torch.zeros(3, 24, 8, 8))

    out = quality.run_visionreward(["a.mp4", "b.mp4"],
                                   ["a red fox", "a blue car"])
    assert out["available"] is True
    # prompt substitution into [[prompt]] (:107)
    assert built[0]["query"] == "Is a red fox shown clearly?"
    assert built[2]["query"] == "Is a blue car shown clearly?"
    assert all(b["template_version"] == "chat" and b["history"] == []
               and b["n_images"] == 1 for b in built)
    want_kwargs = {"max_new_tokens": 2048, "pad_token_id": 128002,
                   "top_k": 1, "do_sample": False, "top_p": 0.1,
                   "temperature": 0.1}
    for g in generated:
        assert g == want_kwargs, g
    # score math: video1 answers (yes, no) -> (1, -1); weight (2, 1)
    # -> mean([2, -1]) = 0.5; video2 (yes, yes) -> mean([2, 1]) = 1.5
    assert out["per_video"] == [0.5, 1.5]
    assert out["vision_reward"] == pytest.approx(1.0)
