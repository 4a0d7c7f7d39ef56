"""CLIP: tokenizer, towers, zero-shot pipeline (tiny configs for speed)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.models.clip import (
    CLIPZeroShot, HashTokenizer, build_zeroshot, class_prompt_tokens, tokenize,
)
from quantize_tpu.models.clip.model import CLIP
from quantize_tpu.models.clip.tokenizer import bytes_to_unicode
from quantize_tpu.nn.intercept import QuantCtx

TINY_VIT = dict(embed_dim=32, vision_layers=2, vision_width=64, vision_patch_size=8,
                context_length=16, vocab_size=64, transformer_width=32,
                transformer_heads=2, transformer_layers=2)
TINY_RN = dict(embed_dim=32, vision_layers=(1, 1, 1, 1), vision_width=8,
               vision_patch_size=0, context_length=16, vocab_size=64,
               transformer_width=32, transformer_heads=2, transformer_layers=1)

W8A8 = {
    "default": {
        "weight": {"n_bits": 8, "symmetric": True, "granularity": "channel",
                   "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                       "range": {"name": "minmax"}},
        "bn_folding": True,
    }
}


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer(64)
    a = tokenize(["a photo of a cat."], tokenizer=tok, context_length=16)
    b = tokenize(["a photo of a cat."], tokenizer=tok, context_length=16)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 16)
    assert a[0, 0] == tok.sot_token
    assert tok.eot_token in a[0]


def test_class_prompt_tokens_shape():
    tok = HashTokenizer(64)
    t = class_prompt_tokens(["cat", "dog"], ["a photo of a {}.", "a {}"],
                            tokenizer=tok, context_length=16)
    assert t.shape == (2, 2, 16)


@pytest.mark.slow
def test_clip_vit_contrastive_forward():
    model = CLIP(**TINY_VIT)
    img = jnp.zeros((2, 32, 32, 3))
    txt = jnp.asarray(np.random.default_rng(0).integers(0, 62, (3, 16)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, txt)
    li, lt = model.apply(variables, img, txt)
    assert li.shape == (2, 3) and lt.shape == (3, 2)


@pytest.mark.slow
def test_clip_modified_resnet_tower():
    model = CLIP(**TINY_RN)
    img = jnp.zeros((1, 64, 64, 3))
    txt = jnp.zeros((1, 16), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, txt)
    li, _ = model.apply(variables, img, txt)
    assert li.shape == (1, 1)


@pytest.mark.slow
def test_zeroshot_pipeline_quantized():
    tok = HashTokenizer(64)
    model = CLIPZeroShot(backbone="ViT-B/16", num_classes=3, ctx=QuantCtx(W8A8),
                         config_overrides=TINY_VIT)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    variables.pop("taps", None)
    # calibrate the vision tower on images
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    variables = {**variables, **upd}
    # precompute zero-shot weights (FP32 text tower, reference behavior)
    variables = build_zeroshot(model, variables, ["cat", "dog", "bird"], tokenizer=tok)
    w = variables["zeroshot"]["weights"]
    assert w.shape == (32, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(w), axis=0), 1.0, rtol=1e-5)

    logits = model.apply(variables, x, mode="quant")
    assert logits.shape == (2, 3) and np.isfinite(np.asarray(logits)).all()

    # quantized text tower: calibrate by running precompute in calibrate mode
    variables2 = build_zeroshot(model, variables, ["cat", "dog", "bird"],
                                tokenizer=tok, mode="calibrate")
    variables2 = build_zeroshot(model, variables2, ["cat", "dog", "bird"],
                                tokenizer=tok, mode="quant")
    logits2 = model.apply(variables2, x, mode="quant")
    assert np.isfinite(np.asarray(logits2)).all()


@pytest.mark.slow
def test_clip_modified_resnet_zeroshot_packed():
    """CLIP RN tower (ModifiedResNet + attention pooling) through the full
    packed deploy path: packed == quant simulation (reference clip_rn50
    zero-shot, ``modelzoo/clip/model.py:94-150``)."""
    from quantize_tpu.deploy import pack_model
    from quantize_tpu.models.clip import build_zeroshot

    clip = CLIPZeroShot(backbone="RN50", num_classes=4, ctx=QuantCtx(W8A8),
                        config_overrides=TINY_RN)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    cv = dict(clip.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    cv.pop("taps", None)
    _, upd = clip.apply(cv, x, mode="calibrate", mutable=["qobs", "qparams"])
    cv = {**cv, **upd}
    tok = HashTokenizer(64)
    cv = build_zeroshot(clip, cv, ["a", "b", "c", "d"], tokenizer=tok,
                        mode="quant")
    y_sim = clip.apply(cv, x, mode="quant")
    deploy = pack_model(clip, cv, x)
    y_packed = clip.apply(deploy, x, mode="packed")
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_sim),
                               rtol=5e-2, atol=5e-2)
