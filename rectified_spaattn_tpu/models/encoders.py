"""Text/image encoder adapters.

The reference gets its conditioning from the HF pipelines' bundled
encoders (Llama for Hunyuan, umT5 for Wan, T5 for CogVideoX, CLIP+T5 for
Flux, CLIP-Vision for Wan-I2V).  Here encoders run through ``transformers``
(torch CPU — a one-time per-prompt cost, negligible next to the denoise
loop) against LOCAL checkpoint directories, producing numpy embeddings the
jitted pipelines consume.  Without checkpoints, ``HashEncoder`` supplies
deterministic pseudo-embeddings so every pipeline stays runnable for
timing/smoke work.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class HashEncoder:
    """Deterministic prompt → pseudo-embedding (no weights needed)."""
    dim: int
    max_len: int

    def __call__(self, prompt: str, batch: int = 1):
        seed = abs(hash(("rsa-tpu", prompt))) % (2 ** 31)
        g = np.random.default_rng(seed)
        n = min(max(len(prompt.split()) + 2, 4), self.max_len)
        emb = np.zeros((batch, self.max_len, self.dim), np.float32)
        emb[:, :n] = g.standard_normal((n, self.dim)).astype(np.float32)
        mask = np.zeros((batch, self.max_len), bool)
        mask[:, :n] = True
        return emb, mask

    def pooled(self, prompt: str, dim: int, batch: int = 1):
        seed = abs(hash(("rsa-tpu-pool", prompt))) % (2 ** 31)
        g = np.random.default_rng(seed)
        return np.tile(g.standard_normal((1, dim)).astype(np.float32),
                       (batch, 1))


@dataclasses.dataclass
class TransformersTextEncoder:
    """Wraps a local ``transformers`` checkpoint (T5/umT5/Llama/CLIP text).

    model_dir must contain the tokenizer + weights; loading is lazy and
    happens on the torch CPU backend.
    """
    model_dir: str
    max_len: int
    kind: str = "t5"            # t5 | umt5 | llama | clip

    def __post_init__(self):
        self._model = None
        self._tok = None

    def _load(self):
        if self._model is not None:
            return
        import torch  # noqa: F401
        from transformers import AutoTokenizer, AutoModel
        self._tok = AutoTokenizer.from_pretrained(self.model_dir)
        self._model = AutoModel.from_pretrained(self.model_dir)
        self._model.eval()

    def __call__(self, prompt: str, batch: int = 1):
        import torch
        self._load()
        toks = self._tok([prompt] * batch, return_tensors="pt",
                         padding="max_length", truncation=True,
                         max_length=self.max_len)
        with torch.no_grad():
            if self.kind == "clip":
                out = self._model.text_model(**toks).last_hidden_state
            else:
                out = self._model(**toks).last_hidden_state
        emb = out.float().numpy()
        mask = toks["attention_mask"].bool().numpy()
        return emb * mask[..., None], mask

    def pooled(self, prompt: str, dim: int = 0, batch: int = 1):
        """CLIP pooled projection (pooler_output) — the Hunyuan/Flux
        conditioning-sum input the reference pipelines feed as
        pooled_prompt_embeds."""
        import torch
        self._load()
        toks = self._tok([prompt] * batch, return_tensors="pt",
                         padding="max_length", truncation=True,
                         max_length=self.max_len)
        with torch.no_grad():
            out = self._model.text_model(**toks)
        return out.pooler_output.float().numpy()


def make_text_encoder(model_dir: Optional[str], dim: int, max_len: int,
                      kind: str = "t5"):
    """Real encoder when a checkpoint dir is given, hash encoder otherwise."""
    if model_dir:
        return TransformersTextEncoder(model_dir, max_len, kind)
    return HashEncoder(dim, max_len)
