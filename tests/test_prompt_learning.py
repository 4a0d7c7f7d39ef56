"""CoOp / CoCoOp prompt learning tests (tiny CLIP)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from quantize_tpu.models.clip.prompt_learning import CoCoOpCLIP, CoOpCLIP

TINY = dict(embed_dim=32, vision_layers=2, vision_width=64, vision_patch_size=8,
            context_length=16, vocab_size=64, transformer_width=32,
            transformer_heads=2, transformer_layers=2)


def test_coop_forward_and_ctx_shape():
    model = CoOpCLIP(backbone="ViT-B/16", num_classes=3, n_ctx=4,
                     config_overrides=TINY, classnames=["cat", "dog", "bird"])
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert variables["params"]["ctx"].shape == (4, 32)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 3)


def test_coop_csc_context():
    model = CoOpCLIP(backbone="ViT-B/16", num_classes=3, n_ctx=4, csc=True,
                     config_overrides=TINY, classnames=["cat", "dog", "bird"])
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert variables["params"]["ctx"].shape == (3, 4, 32)


@pytest.mark.slow
def test_coop_ctx_is_trainable():
    model = CoOpCLIP(backbone="ViT-B/16", num_classes=2, n_ctx=2,
                     config_overrides=TINY, classnames=["cat", "dog"])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray([0, 1, 0, 1])
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(ctx_p):
        params = {**variables["params"], "ctx": ctx_p}
        logits = model.apply({**variables, "params": params}, x)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    g = jax.grad(loss_fn)(variables["params"]["ctx"])
    assert float(jnp.linalg.norm(g)) > 0  # gradient flows into the context


def test_cocoop_forward():
    model = CoCoOpCLIP(backbone="ViT-B/16", num_classes=3, n_ctx=2,
                       config_overrides=TINY, classnames=["cat", "dog", "bird"])
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 3)
