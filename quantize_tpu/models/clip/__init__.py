"""CLIP zero-shot classification wrapper + zoo registration.

Covers the reference ``CLIPModel`` (``modelzoo/clip/__init__.py:16-60``):
class-prompt text embeddings are precomputed once through the text tower
(normalized, averaged over templates, re-normalized) and classification is
``exp(logit_scale) * image_features @ zeroshot_weights``. Registered names
match the reference registry (``clip/__init__.py:93-103``).

Beyond the reference: the text tower here is quantization-aware too — the
reference quantizes after the zero-shot weights were already computed, so
its text quantizers are dead weight; here ``precompute`` can run in
``'quant'`` mode after calibration to serve fully-quantized text towers.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...nn.intercept import QuantCtx
from .model import CLIP, CLIP_CONFIGS
from .tokenizer import (
    CONTEXT_LENGTH, BPETokenizer, HashTokenizer, get_default_tokenizer, tokenize,
)

DEFAULT_PROMPTS = ["a photo of a {}."]


class CLIPZeroShot(nn.Module):
    backbone: str
    num_classes: int
    ctx: QuantCtx = QuantCtx.fp32()
    config_overrides: Optional[dict] = None

    def setup(self):
        cfg = dict(CLIP_CONFIGS[self.backbone])
        if self.config_overrides:
            cfg.update(self.config_overrides)
        self._cfg = cfg
        self.clip = CLIP(ctx=self.ctx, **cfg)
        self.zeroshot_weights = self.variable(
            "zeroshot", "weights", jnp.zeros,
            (cfg["embed_dim"], self.num_classes), jnp.float32,
        )

    def __call__(self, images: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        del train
        if self.is_initializing():
            # touch the text tower so init creates its params
            dummy = jnp.zeros((1, self._cfg["context_length"]), jnp.int32)
            self.clip.encode_text(dummy, mode="fp32")
        img = self.clip.encode_image(images, mode=mode)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        return jnp.exp(self.clip.logit_scale) * img @ self.zeroshot_weights.value

    def precompute(self, tokens: jnp.ndarray, mode: str = "fp32") -> jnp.ndarray:
        """Compute and store zero-shot weights.

        tokens: (num_classes, n_templates, context_length) int32. Run with
        ``mutable=['zeroshot']`` (plus observer collections when
        ``mode='calibrate'``).
        """
        c, t, length = tokens.shape
        emb = self.clip.encode_text(tokens.reshape(c * t, length), mode=mode)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        emb = emb.reshape(c, t, -1).mean(axis=1)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        self.zeroshot_weights.value = emb.T
        return emb


def class_prompt_tokens(
    classnames: Sequence[str],
    prompts: Optional[Sequence[str]] = None,
    tokenizer=None,
    context_length: int = CONTEXT_LENGTH,
) -> np.ndarray:
    """(num_classes, n_templates, context_length) token grid."""
    prompts = list(prompts) if prompts else list(DEFAULT_PROMPTS)
    texts = [p.format(c) for c in classnames for p in prompts]
    toks = tokenize(texts, tokenizer=tokenizer, context_length=context_length)
    return toks.reshape(len(classnames), len(prompts), context_length)


def build_zeroshot(model: CLIPZeroShot, variables: dict, classnames, prompts=None,
                   tokenizer=None, mode: str = "fp32") -> dict:
    """Precompute zero-shot weights and return updated variables."""
    cfg = dict(CLIP_CONFIGS[model.backbone])
    if model.config_overrides:
        cfg.update(model.config_overrides)
    toks = class_prompt_tokens(classnames, prompts, tokenizer, cfg["context_length"])
    mutable = ["zeroshot"] if mode != "calibrate" else ["zeroshot", "qobs", "qparams"]
    _, upd = model.apply(variables, jnp.asarray(toks), mode=mode,
                         method=CLIPZeroShot.precompute, mutable=mutable)
    return {**variables, **upd}


def _make_clip(backbone: str):
    def ctor(num_classes: int = 1000, ctx: Optional[QuantCtx] = None, **kw):
        return CLIPZeroShot(backbone=backbone, num_classes=num_classes,
                            ctx=ctx or QuantCtx.fp32(), **kw)

    return ctor


CLIP_MODELS = {
    "clip_rn50": _make_clip("RN50"),
    "clip_rn101": _make_clip("RN101"),
    "clip_rn50x4": _make_clip("RN50x4"),
    "clip_rn50x16": _make_clip("RN50x16"),
    "clip_rn50x64": _make_clip("RN50x64"),
    "clip_vit-b32": _make_clip("ViT-B/32"),
    "clip_vit-b16": _make_clip("ViT-B/16"),
    "clip_vit-l14": _make_clip("ViT-L/14"),
    "clip_vit-l14@336px": _make_clip("ViT-L/14@336px"),
}

__all__ = [
    "CLIP", "CLIPZeroShot", "CLIP_CONFIGS", "CLIP_MODELS",
    "BPETokenizer", "HashTokenizer", "get_default_tokenizer", "tokenize",
    "class_prompt_tokens", "build_zeroshot", "DEFAULT_PROMPTS",
]
