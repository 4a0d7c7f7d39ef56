"""CoOp / CoCoOp prompt learning over the quantized CLIP towers.

Re-implementation of the reference's prompt-learning modules
(``modelzoo/clip/coop.py:35-170``, ``cocoop.py:14-123`` — present in the
reference but never registered in its MODELS): learnable context embeddings
replace the hand-written prompt templates.

* **CoOp**: ``n_ctx`` learnable context vectors (optionally class-specific,
  ``csc``) prepended to each class-name embedding; text features come from
  the frozen (optionally quantized) text transformer.
* **CoCoOp**: additionally a small meta-net maps each image's features to a
  per-instance shift of the context vectors.

The text tower runs on *embeddings* directly (the prompt path bypasses the
token-embedding lookup), mirroring the reference ``TextEncoder``
(``coop.py:12-33``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...nn.intercept import QuantCtx
from .model import CLIP, CLIP_CONFIGS, causal_mask
from .tokenizer import CONTEXT_LENGTH, get_default_tokenizer, tokenize


def _encode_from_embeddings(clip: CLIP, emb: jnp.ndarray, eot_idx: jnp.ndarray,
                            mode: str = "fp32") -> jnp.ndarray:
    """Text features from pre-built token embeddings (reference
    ``coop.py:21-33``)."""
    x = emb + clip.positional_embedding[None, : emb.shape[1]]
    x = clip.transformer(x, mode=mode, mask=causal_mask(x.shape[1]))
    x = clip.ln_final(x)
    x = x[jnp.arange(x.shape[0]), eot_idx]
    return x @ clip.text_projection


class CoOpCLIP(nn.Module):
    """CLIP with learned prompt context (CoOp)."""

    backbone: str
    num_classes: int
    n_ctx: int = 16
    csc: bool = False  # class-specific context
    ctx: QuantCtx = QuantCtx.fp32()
    config_overrides: Optional[dict] = None
    classnames: Optional[Sequence[str]] = None

    def setup(self):
        cfg = dict(CLIP_CONFIGS[self.backbone])
        if self.config_overrides:
            cfg.update(self.config_overrides)
        self._cfg = cfg
        self.clip = CLIP(ctx=self.ctx, **cfg)
        dim = cfg["transformer_width"]
        shape = (self.num_classes, self.n_ctx, dim) if self.csc else (self.n_ctx, dim)
        self.ctx_vectors = self.param("ctx", nn.initializers.normal(0.02), shape)
        # class-name token grids: "X ... X <classname>." per class
        names = list(self.classnames or [str(i) for i in range(self.num_classes)])
        prefix = " ".join(["X"] * self.n_ctx)
        tok = get_default_tokenizer()
        if tok.vocab_size > cfg["vocab_size"]:
            from .tokenizer import HashTokenizer

            tok = HashTokenizer(cfg["vocab_size"])
        toks = tokenize([f"{prefix} {n.replace('_', ' ')}." for n in names],
                        tokenizer=tok, context_length=cfg["context_length"])
        self._tokens = jnp.asarray(toks)

    def _prompt_embeddings(self, extra_shift: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """(n_cls, L, dim) embeddings with slots 1..n_ctx replaced by the
        learned context (reference ``coop.py:96-141`` 'end' position)."""
        emb = self.clip.token_embedding(self._tokens)  # (n_cls, L, dim)
        ctx = self.ctx_vectors
        if ctx.ndim == 2:
            ctx = jnp.broadcast_to(ctx[None], (self.num_classes, *ctx.shape))
        if extra_shift is not None:
            ctx = ctx + extra_shift[None, None, :]
        return jnp.concatenate(
            [emb[:, :1], ctx, emb[:, 1 + self.n_ctx:]], axis=1
        )

    def text_features(self, mode: str = "fp32",
                      extra_shift: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        emb = self._prompt_embeddings(extra_shift)
        eot = jnp.argmax(self._tokens, axis=-1)
        feats = _encode_from_embeddings(self.clip, emb, eot, mode=mode)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def __call__(self, images: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        del train
        img = self.clip.encode_image(images, mode=mode)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = self.text_features(mode=mode)
        return jnp.exp(self.clip.logit_scale) * img @ txt.T


class CoCoOpCLIP(CoOpCLIP):
    """CoOp + instance-conditioned context via a meta-net (CoCoOp)."""

    def setup(self):
        super().setup()
        dim = self._cfg["transformer_width"]
        vis_dim = self._cfg["embed_dim"]
        self.meta_net = [
            nn.Dense(vis_dim // 16, name="meta_fc1"),
            nn.Dense(dim, name="meta_fc2"),
        ]

    def _meta_shift(self, img_feat: jnp.ndarray) -> jnp.ndarray:
        h = self.meta_net[0](img_feat)
        h = nn.relu(h)
        return self.meta_net[1](h)

    def __call__(self, images: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        del train
        img = self.clip.encode_image(images, mode=mode)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        shifts = self._meta_shift(img)  # (batch, dim)

        def per_image(feat, shift):
            txt = self.text_features(mode=mode, extra_shift=shift)
            return jnp.exp(self.clip.logit_scale) * feat @ txt.T

        import jax

        return jax.vmap(per_image)(img, shifts)
