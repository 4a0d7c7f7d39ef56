"""ViT + CLIP torch checkpoint importers: synthetic state dicts round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.models.clip import CLIPZeroShot
from quantize_tpu.models.import_clip import import_clip
from quantize_tpu.models.import_vit import import_vit
from quantize_tpu.models.vit import VisionTransformer
from quantize_tpu.nn.intercept import QuantCtx


def synth_vit_state_dict(rng, d=32, layers=2, mlp=64, patch=8, n_patches=17, ncls=5):
    sd = {}
    sd["conv_proj.weight"] = rng.normal(size=(d, 3, patch, patch)).astype(np.float32) * 0.05
    sd["conv_proj.bias"] = rng.normal(size=(d,)).astype(np.float32) * 0.01
    sd["class_token"] = rng.normal(size=(1, 1, d)).astype(np.float32) * 0.02
    sd["encoder.pos_embedding"] = rng.normal(size=(1, n_patches, d)).astype(np.float32) * 0.02

    def lin(key, o, i):
        sd[f"{key}.weight"] = rng.normal(size=(o, i)).astype(np.float32) * 0.05
        sd[f"{key}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.01

    def ln(key, c):
        sd[f"{key}.weight"] = rng.uniform(0.8, 1.2, size=(c,)).astype(np.float32)
        sd[f"{key}.bias"] = rng.normal(size=(c,)).astype(np.float32) * 0.01

    for i in range(layers):
        t = f"encoder.layers.encoder_layer_{i}"
        ln(f"{t}.ln_1", d)
        ln(f"{t}.ln_2", d)
        sd[f"{t}.self_attention.in_proj_weight"] = rng.normal(size=(3 * d, d)).astype(np.float32) * 0.05
        sd[f"{t}.self_attention.in_proj_bias"] = rng.normal(size=(3 * d,)).astype(np.float32) * 0.01
        lin(f"{t}.self_attention.out_proj", d, d)
        lin(f"{t}.mlp.0", mlp, d)
        lin(f"{t}.mlp.3", d, mlp)
    ln("encoder.ln", d)
    lin("heads.head", ncls, d)
    return sd


def test_import_vit_fills_and_runs():
    rng = np.random.default_rng(0)
    model = VisionTransformer(image_size=32, patch_size=8, num_layers=2, num_heads=2,
                              hidden_dim=32, mlp_dim=64, num_classes=5)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    sd = synth_vit_state_dict(rng)
    v2 = import_vit(sd, variables, num_layers=2)
    y = model.apply(v2, x)
    assert y.shape == (2, 5) and np.isfinite(np.asarray(y)).all()
    # weights actually changed
    assert not np.allclose(
        np.asarray(variables["params"]["head"]["kernel"]),
        np.asarray(v2["params"]["head"]["kernel"]))
    # transpose convention: head kernel == sd fc weight^T
    np.testing.assert_allclose(np.asarray(v2["params"]["head"]["kernel"]),
                               sd["heads.head.weight"].T)


def synth_clip_vit_state_dict(rng, d=32, vis_layers=2, txt_layers=2, width=64,
                              patch=8, embed=32, vocab=64, ctx_len=16):
    sd = {}
    sd["visual.conv1.weight"] = rng.normal(size=(width, 3, patch, patch)).astype(np.float32) * 0.05
    sd["visual.class_embedding"] = rng.normal(size=(width,)).astype(np.float32) * 0.02
    n_tok = (32 // patch) ** 2 + 1
    sd["visual.positional_embedding"] = rng.normal(size=(n_tok, width)).astype(np.float32) * 0.02
    sd["visual.proj"] = rng.normal(size=(width, embed)).astype(np.float32) * 0.05

    def lin(key, o, i):
        sd[f"{key}.weight"] = rng.normal(size=(o, i)).astype(np.float32) * 0.05
        sd[f"{key}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.01

    def ln(key, c):
        sd[f"{key}.weight"] = rng.uniform(0.8, 1.2, size=(c,)).astype(np.float32)
        sd[f"{key}.bias"] = rng.normal(size=(c,)).astype(np.float32) * 0.01

    def resblock(prefix, dd):
        ln(f"{prefix}.ln_1", dd)
        ln(f"{prefix}.ln_2", dd)
        sd[f"{prefix}.attn.in_proj_weight"] = rng.normal(size=(3 * dd, dd)).astype(np.float32) * 0.05
        sd[f"{prefix}.attn.in_proj_bias"] = rng.normal(size=(3 * dd,)).astype(np.float32) * 0.01
        lin(f"{prefix}.attn.out_proj", dd, dd)
        lin(f"{prefix}.mlp.c_fc", dd * 4, dd)
        lin(f"{prefix}.mlp.c_proj", dd, dd * 4)

    ln("visual.ln_pre", width)
    ln("visual.ln_post", width)
    for i in range(vis_layers):
        resblock(f"visual.transformer.resblocks.{i}", width)
    for i in range(txt_layers):
        resblock(f"transformer.resblocks.{i}", d)
    sd["token_embedding.weight"] = rng.normal(size=(vocab, d)).astype(np.float32) * 0.02
    sd["positional_embedding"] = rng.normal(size=(ctx_len, d)).astype(np.float32) * 0.01
    ln("ln_final", d)
    sd["text_projection"] = rng.normal(size=(d, embed)).astype(np.float32) * 0.05
    sd["logit_scale"] = np.asarray(2.6593, np.float32)
    return sd


@pytest.mark.slow  # full CLIP tower import; machinery covered by test_import_vit_fills_and_runs + test_clip.py
def test_import_clip_vit_tower():
    rng = np.random.default_rng(1)
    overrides = dict(embed_dim=32, vision_layers=2, vision_width=64, vision_patch_size=8,
                     context_length=16, vocab_size=64, transformer_width=32,
                     transformer_heads=2, transformer_layers=2)
    model = CLIPZeroShot(backbone="ViT-B/16", num_classes=3, ctx=QuantCtx.fp32(),
                         config_overrides=overrides)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x))
    sd = synth_clip_vit_state_dict(rng)
    v2 = import_clip(sd, variables)
    y = model.apply(v2, x)
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_allclose(
        float(v2["params"]["clip"]["logit_scale"]), 2.6593, rtol=1e-6)
