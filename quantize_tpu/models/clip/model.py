"""CLIP architecture (vision + text towers), quantization-aware.

Re-implementation of the reference's vendored OpenAI CLIP
(``modelzoo/clip/model.py``): ``ModifiedResNet`` (3-conv stem, anti-aliased
strided convs, attention pooling — ``model.py:94-154``), the CLIP
``VisionTransformer`` (``:206-240``), the causal text transformer
(``:243-356``), QuickGELU MLPs, and the ``logit_scale``-scaled contrastive
head. All conv/linear/attention sites are quantization-aware via the same
:class:`QuantCtx` path resolution the CNN/ViT zoos use; LayerNorms and the
``proj``/``text_projection`` parameters stay float (the reference's surgery
never touches bare ``nn.Parameter`` projections).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...nn.attention import QuantMultiheadAttention
from ...nn.intercept import QuantCtx
from ...nn.layers import QuantConv, QuantDense
from ..resnet import _BN, _conv_kind


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


def causal_mask(n: int) -> jnp.ndarray:
    return jnp.triu(jnp.full((n, n), -jnp.inf), k=1)


class CLIPBottleneck(nn.Module):
    """CLIP's anti-aliased bottleneck (``model.py:10-55``): all convs stride
    1, an avgpool after conv2 when stride > 1, avgpool-prefixed downsample."""

    ctx: QuantCtx
    qpath: str
    planes: int
    out_planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        from ..resnet import _ConvBN

        identity = x
        out = _ConvBN(self.ctx, f"{self.qpath}/conv1", self.planes, (1, 1),
                      name_conv="conv1", name_bn="bn1")(x, mode, train)
        out = nn.relu(out)
        out = _ConvBN(self.ctx, f"{self.qpath}/conv2", self.planes, (3, 3),
                      name_conv="conv2", name_bn="bn2")(out, mode, train)
        out = nn.relu(out)
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride), (self.stride, self.stride))
        out = _ConvBN(self.ctx, f"{self.qpath}/conv3", self.out_planes, (1, 1),
                      name_conv="conv3", name_bn="bn3")(out, mode, train)
        if self.downsample:
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       (self.stride, self.stride))
            identity = _ConvBN(self.ctx, f"{self.qpath}/downsample/0", self.out_planes,
                               (1, 1), name_conv="downsample_conv",
                               name_bn="downsample_bn")(identity, mode, train)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pooling (``model.py:58-91``): the query is the mean
    token; four quantized linears (q/k/v/c projections)."""

    ctx: QuantCtx
    qpath: str
    embed_dim: int
    num_heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32") -> jnp.ndarray:
        n, h, w, c = x.shape
        seq = x.reshape(n, h * w, c)
        seq = jnp.concatenate([jnp.mean(seq, axis=1, keepdims=True), seq], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(c ** -0.5),
                         (h * w + 1, c))
        seq = seq + pos[None]

        q = QuantDense(self.embed_dim, quant=self.ctx.resolve(f"{self.qpath}/q_proj", "nn_linear"),
                       name="q_proj")(seq[:, :1], mode=mode)
        k = QuantDense(self.embed_dim, quant=self.ctx.resolve(f"{self.qpath}/k_proj", "nn_linear"),
                       name="k_proj")(seq, mode=mode)
        v = QuantDense(self.embed_dim, quant=self.ctx.resolve(f"{self.qpath}/v_proj", "nn_linear"),
                       name="v_proj")(seq, mode=mode)

        hd = self.embed_dim // self.num_heads
        qh = q.reshape(n, 1, self.num_heads, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(n, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(n, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(n, 1, self.embed_dim)[:, 0]
        return QuantDense(self.output_dim, quant=self.ctx.resolve(f"{self.qpath}/c_proj", "nn_linear"),
                          name="c_proj")(out, mode=mode)


class ModifiedResNet(nn.Module):
    """CLIP's ResNet visual tower (``model.py:94-154``)."""

    layers: Sequence[int]
    output_dim: int
    heads: int
    width: int = 64
    ctx: QuantCtx = QuantCtx.fp32()

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        from ..resnet import _ConvBN

        ctx = self.ctx
        # 3-conv stem with avgpool
        x = _ConvBN(ctx, "/visual/conv1", self.width // 2, (3, 3), (2, 2),
                    name_conv="conv1", name_bn="bn1")(x, mode, train)
        x = nn.relu(x)
        x = _ConvBN(ctx, "/visual/conv2", self.width // 2, (3, 3),
                    name_conv="conv2", name_bn="bn2")(x, mode, train)
        x = nn.relu(x)
        x = _ConvBN(ctx, "/visual/conv3", self.width, (3, 3),
                    name_conv="conv3", name_bn="bn3")(x, mode, train)
        x = nn.relu(x)
        x = nn.avg_pool(x, (2, 2), (2, 2))

        in_planes = self.width
        for stage, n_blocks in enumerate(self.layers):
            planes = self.width * (2 ** stage)
            out_planes = planes * 4
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                ds = b == 0 and (s > 1 or in_planes != out_planes)
                x = CLIPBottleneck(
                    ctx, f"/visual/layer{stage + 1}/{b}", planes, out_planes, s, ds,
                    name=f"layer{stage + 1}_{b}",
                )(x, mode, train)
                in_planes = out_planes

        return AttentionPool2d(
            ctx, "/visual/attnpool", self.width * 32, self.heads, self.output_dim,
            name="attnpool",
        )(x, mode=mode)


class ResidualAttentionBlock(nn.Module):
    """ln→attn→residual; ln→QuickGELU-MLP→residual (``model.py:171-192``)."""

    ctx: QuantCtx
    qpath: str
    d_model: int
    n_head: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32",
                 mask: Optional[jnp.ndarray] = None,
                 seq_len: int = 0, valid_len: int = 0) -> jnp.ndarray:
        from ...nn.norm import FusedLayerNorm

        ln_1 = FusedLayerNorm(self.d_model, epsilon=1e-5, name="ln_1")
        ln_2 = FusedLayerNorm(self.d_model, epsilon=1e-5, name="ln_2")
        attn = QuantMultiheadAttention(
            self.d_model, self.n_head,
            quant=self.ctx.resolve(f"{self.qpath}/attn", "nn_multiheadattention"),
            name="attn",
        )
        c_fc = QuantDense(self.d_model * 4,
                          quant=self.ctx.resolve(f"{self.qpath}/mlp/c_fc", "nn_linear"),
                          name="c_fc")
        c_proj = QuantDense(self.d_model,
                            quant=self.ctx.resolve(f"{self.qpath}/mlp/c_proj", "nn_linear"),
                            name="c_proj")
        if mode == "packed":
            # LN defers into the consumer's int8 quantize (as the ViT blocks);
            # the carry may be 2-D (B*S, E) rows (seq_len set) — same
            # relayout-free layout as the packed ViT encoder
            x = x + attn(x, mode=mode, mask=mask, pre_norm=ln_1.params_tuple(),
                         seq_len=seq_len, valid_len=valid_len)
            h = c_fc(x, mode=mode, pre_norm=ln_2.params_tuple())
        else:
            x = x + attn(ln_1(x, mode), mode=mode, mask=mask)
            h = c_fc(ln_2(x, mode), mode=mode)
        h = quick_gelu(h)
        return x + c_proj(h, mode=mode)


class CLIPTransformer(nn.Module):
    ctx: QuantCtx
    qpath: str
    width: int
    layers: int
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32",
                 mask: Optional[jnp.ndarray] = None,
                 seq_len: int = 0, valid_len: int = 0) -> jnp.ndarray:
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.ctx, f"{self.qpath}/resblocks/{i}", self.width, self.heads,
                name=f"resblock_{i}",
            )(x, mode=mode, mask=mask, seq_len=seq_len, valid_len=valid_len)
        return x


class CLIPVisionTransformer(nn.Module):
    """CLIP ViT tower (``model.py:206-240``): ln_pre + ln_post + proj."""

    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int
    ctx: QuantCtx = QuantCtx.fp32()

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        del train
        n = x.shape[0]
        x = QuantConv(
            self.width, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID", use_bias=False,
            quant=self.ctx.resolve("/visual/conv1", "nn_conv2d"), name="conv1",
        )(x, mode=mode)
        x = x.reshape(n, -1, self.width)
        scale = self.width ** -0.5
        cls = self.param("class_embedding", nn.initializers.normal(scale), (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, self.width)), x], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(scale),
                         (x.shape[1], self.width))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        s_len = x.shape[1]
        packed = mode == "packed"
        s_pad = s_len
        if packed:
            # 2-D rows through the tower (relayout-free; see models/vit.py)
            s_pad = -(-s_len // 8) * 8
            if s_pad != s_len:
                x = jnp.pad(x, ((0, 0), (0, s_pad - s_len), (0, 0)))
            x = x.reshape(n * s_pad, self.width)
        x = CLIPTransformer(self.ctx, "/visual/transformer", self.width, self.layers,
                            self.heads, name="transformer")(
            x, mode=mode, seq_len=s_pad, valid_len=s_len)
        x = x[::s_pad] if packed else x[:, 0]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)
        proj = self.param("proj", nn.initializers.normal(scale), (self.width, self.output_dim))
        return x @ proj


class CLIP(nn.Module):
    """Full CLIP: vision tower + causal text transformer (``model.py:243``)."""

    embed_dim: int
    # vision
    vision_layers: Union[Tuple[int, ...], int]
    vision_width: int
    vision_patch_size: int
    # text
    context_length: int
    vocab_size: int
    transformer_width: int
    transformer_heads: int
    transformer_layers: int
    ctx: QuantCtx = QuantCtx.fp32()

    def setup(self):
        if isinstance(self.vision_layers, (tuple, list)):
            self.visual = ModifiedResNet(
                layers=self.vision_layers, output_dim=self.embed_dim,
                heads=self.vision_width * 32 // 64, width=self.vision_width,
                ctx=self.ctx,
            )
        else:
            self.visual = CLIPVisionTransformer(
                patch_size=self.vision_patch_size, width=self.vision_width,
                layers=self.vision_layers, heads=self.vision_width // 64,
                output_dim=self.embed_dim, ctx=self.ctx,
            )
        self.transformer = CLIPTransformer(
            self.ctx, "/transformer", self.transformer_width,
            self.transformer_layers, self.transformer_heads,
        )
        self.token_embedding = nn.Embed(self.vocab_size, self.transformer_width,
                                        embedding_init=nn.initializers.normal(0.02))
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.transformer_width),
        )
        self.ln_final = nn.LayerNorm(epsilon=1e-5)
        self.text_projection = self.param(
            "text_projection", nn.initializers.normal(self.transformer_width ** -0.5),
            (self.transformer_width, self.embed_dim),
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.asarray(np.log(1 / 0.07), jnp.float32), (),
        )

    def encode_image(self, image: jnp.ndarray, mode: str = "fp32") -> jnp.ndarray:
        return self.visual(image, mode=mode)

    def encode_text(self, text: jnp.ndarray, mode: str = "fp32") -> jnp.ndarray:
        """text: (N, context_length) int tokens; features from the EOT
        position (highest token id, reference ``model.py:343-356``)."""
        x = self.token_embedding(text)
        x = x + self.positional_embedding[None, : x.shape[1]]
        n, s_len = x.shape[0], x.shape[1]
        packed = mode == "packed"
        s_pad = s_len
        if packed:
            s_pad = -(-s_len // 8) * 8
            if s_pad != s_len:
                x = jnp.pad(x, ((0, 0), (0, s_pad - s_len), (0, 0)))
            x = x.reshape(n * s_pad, x.shape[-1])
        # "causal" sentinel: packed mode runs the fused Pallas attention
        # kernel with an in-kernel causal mask (pad keys also masked);
        # simulation modes materialize the additive mask (same math as the
        # reference's attn_mask)
        x = self.transformer(x, mode=mode, mask="causal",
                             seq_len=s_pad, valid_len=s_len)
        x = self.ln_final(x)
        eot = jnp.argmax(text, axis=-1)
        if packed:
            x = x[jnp.arange(n) * s_pad + eot]
        else:
            x = x[jnp.arange(n), eot]
        return x @ self.text_projection

    def __call__(self, image: jnp.ndarray, text: jnp.ndarray, mode: str = "fp32"):
        img = self.encode_image(image, mode)
        txt = self.encode_text(text, mode)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


# backbone name -> constructor kwargs (reference ``clip/clip.py:30-44`` model set)
CLIP_CONFIGS = {
    "RN50": dict(embed_dim=1024, vision_layers=(3, 4, 6, 3), vision_width=64,
                 vision_patch_size=0, context_length=77, vocab_size=49408,
                 transformer_width=512, transformer_heads=8, transformer_layers=12),
    "RN101": dict(embed_dim=512, vision_layers=(3, 4, 23, 3), vision_width=64,
                  vision_patch_size=0, context_length=77, vocab_size=49408,
                  transformer_width=512, transformer_heads=8, transformer_layers=12),
    "RN50x4": dict(embed_dim=640, vision_layers=(4, 6, 10, 6), vision_width=80,
                   vision_patch_size=0, context_length=77, vocab_size=49408,
                   transformer_width=640, transformer_heads=10, transformer_layers=12),
    "RN50x16": dict(embed_dim=768, vision_layers=(6, 8, 18, 8), vision_width=96,
                    vision_patch_size=0, context_length=77, vocab_size=49408,
                    transformer_width=768, transformer_heads=12, transformer_layers=12),
    "RN50x64": dict(embed_dim=1024, vision_layers=(3, 15, 36, 10), vision_width=128,
                    vision_patch_size=0, context_length=77, vocab_size=49408,
                    transformer_width=1024, transformer_heads=16, transformer_layers=12),
    "ViT-B/32": dict(embed_dim=512, vision_layers=12, vision_width=768,
                     vision_patch_size=32, context_length=77, vocab_size=49408,
                     transformer_width=512, transformer_heads=8, transformer_layers=12),
    "ViT-B/16": dict(embed_dim=512, vision_layers=12, vision_width=768,
                     vision_patch_size=16, context_length=77, vocab_size=49408,
                     transformer_width=512, transformer_heads=8, transformer_layers=12),
    "ViT-L/14": dict(embed_dim=768, vision_layers=24, vision_width=1024,
                     vision_patch_size=14, context_length=77, vocab_size=49408,
                     transformer_width=768, transformer_heads=12, transformer_layers=12),
    "ViT-L/14@336px": dict(embed_dim=768, vision_layers=24, vision_width=1024,
                           vision_patch_size=14, context_length=77, vocab_size=49408,
                           transformer_width=768, transformer_heads=12,
                           transformer_layers=12),
}
