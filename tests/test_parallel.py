"""GSPMD sharding: packed weights tensor-shard; sharded forward == local."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from quantize_tpu.deploy import pack_model
from quantize_tpu.models import MODELS
from quantize_tpu.nn.intercept import QuantCtx
from quantize_tpu.parallel import make_mesh, shard_variables, spec_for_variables

W8A8 = {
    "default": {
        "weight": {"n_bits": 8, "symmetric": True, "granularity": "channel",
                   "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                       "range": {"name": "minmax"}},
        "bn_folding": True,
    }
}


def _packed_testcnn():
    model = MODELS.build("testcnn", num_classes=8, ctx=QuantCtx(W8A8))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    variables.pop("taps", None)
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    variables = {**variables, **upd}
    return model, variables, pack_model(model, variables, x), x


def test_packed_weights_get_model_sharding():
    model, variables, deploy, x = _packed_testcnn()
    specs = spec_for_variables(deploy, tp=4)
    # conv int8 weights shard on out-channel
    conv_spec = specs["packed"]["conv2"]["w_int"]
    assert conv_spec == P(None, None, None, "model")
    fc_spec = specs["packed"]["fc1"]["w_int"]
    assert fc_spec == P(None, "model")
    assert specs["packed"]["fc1"]["w_scale"] == P("model")


def test_sharded_packed_forward_matches_local():
    model, variables, deploy, x = _packed_testcnn()
    ref = model.apply(deploy, x, mode="packed")

    mesh = make_mesh(dp=2, tp=4)
    deploy_sharded = shard_variables(mesh, deploy)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))

    @jax.jit
    def fwd(v, img):
        return model.apply(v, img, mode="packed")

    out = fwd(deploy_sharded, x_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_sharded_quant_sim_forward_matches_local():
    model, variables, deploy, x = _packed_testcnn()
    ref = model.apply(variables, x, mode="quant")
    mesh = make_mesh(dp=4, tp=2)
    vs = shard_variables(mesh, variables)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))

    @jax.jit
    def fwd(v, img):
        return model.apply(v, img, mode="quant")

    out = fwd(vs, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_sharded_clip_zeroshot_packed_matches_local():
    """BASELINE config[4] distributed: packed CLIP image tower + quantized
    text tower, zero-shot weights computed once (replicated), batch sharded
    on ``data``, packed tower weights on ``model`` (the reference CLIPModel
    path, ``modelzoo/clip/__init__.py:53-60``, GSPMD-sharded)."""
    from quantize_tpu.models.clip import (
        CLIPZeroShot, HashTokenizer, build_zeroshot,
    )

    tiny = dict(embed_dim=32, vision_layers=2, vision_width=64,
                vision_patch_size=8, context_length=16, vocab_size=64,
                transformer_width=32, transformer_heads=2,
                transformer_layers=2)
    clip = CLIPZeroShot(backbone="ViT-B/16", num_classes=8,
                        ctx=QuantCtx(W8A8), config_overrides=tiny)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    cv = dict(clip.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    cv.pop("taps", None)
    _, upd = clip.apply(cv, x, mode="calibrate", mutable=["qobs", "qparams"])
    cv = {**cv, **upd}
    tok = HashTokenizer(64)
    names = [f"class{i}" for i in range(8)]
    cv = build_zeroshot(clip, cv, names, tokenizer=tok, mode="calibrate")
    cv = build_zeroshot(clip, cv, names, tokenizer=tok, mode="quant")
    deploy = pack_model(clip, cv, x)
    assert "zeroshot" in deploy  # pack_model must carry the class weights

    fwd = jax.jit(lambda v, img: clip.apply(v, img, mode="packed"))
    local = fwd(deploy, x)

    mesh = make_mesh(dp=2, tp=4)
    vs = shard_variables(mesh, deploy)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    out = np.asarray(fwd(vs, xs), np.float32)
    local = np.asarray(local, np.float32)
    # Tensor-parallel partitioning reassociates the f32 matmul sums feeding
    # each activation quantize; a pre-round value sitting exactly on a .5
    # boundary can flip one int8 step, smearing a small error through the
    # sample's downstream layers (observed: exactly 1 of 8 samples differs,
    # max 0.35% of the feature scale). Assert prediction equality plus a
    # boundary-flip-sized logit tolerance instead of bit equality.
    assert (out.argmax(-1) == local.argmax(-1)).all()
    span = np.abs(local).max()
    assert np.abs(out - local).max() <= 0.03 * span, (
        np.abs(out - local).max(), span)
