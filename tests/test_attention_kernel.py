"""Pallas fused MHA kernel vs jnp oracle (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.ops.pallas.attention import _mha_ref, mha_fused_qkv


@pytest.mark.parametrize("b,s,h,d", [(2, 197, 12, 64), (1, 77, 8, 64),
                                     (2, 300, 2, 128), (3, 5, 2, 64)])
@pytest.mark.parametrize("causal", [False, True])
def test_mha_kernel_matches_oracle(rng, b, s, h, d, causal):
    e = h * d
    qkv = rng.normal(size=(b, s, 3 * e)).astype(np.float32)
    out = mha_fused_qkv(jnp.asarray(qkv), h, causal=causal)
    ref = _mha_ref(jnp.asarray(qkv), h, causal, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_mha_kernel_bf16_io(rng):
    qkv = rng.normal(size=(2, 50, 3 * 128)).astype(np.float32)
    out = mha_fused_qkv(jnp.asarray(qkv, jnp.bfloat16), 2)
    assert out.dtype == jnp.bfloat16
    ref = _mha_ref(jnp.asarray(qkv), 2, False, jnp.float32)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_packed_attention_uses_kernel_matches_sim(rng):
    """Module-level: packed attention (kernel path) == quant simulation."""
    import jax

    from quantize_tpu.deploy import pack_model
    from quantize_tpu.nn.attention import QuantMultiheadAttention
    from quantize_tpu.nn.layers import LayerQuantCfg

    cfg = LayerQuantCfg(
        weight={"n_bits": 8, "symmetric": True, "signed": True,
                "granularity": "channel", "range": {"name": "minmax"}},
        activation={"n_bits": 8, "symmetric": False, "granularity": "layer",
                    "range": {"name": "minmax"}},
    )
    x = jnp.asarray(rng.normal(size=(2, 9, 128)).astype(np.float32))
    m = QuantMultiheadAttention(128, 2, quant=cfg)
    v = dict(m.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    v.pop("taps", None)
    _, upd = m.apply(v, x, mode="calibrate", mutable=["qobs", "qparams"])
    v = {**v, **upd}
    y_sim = m.apply(v, x, mode="quant")
    deploy = pack_model(m, v, x)
    y_packed = m.apply(deploy, x, mode="packed")
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_sim),
                               rtol=2e-2, atol=2e-2)

    # causal sentinel path
    y_sim_c = m.apply(v, x, mode="quant", mask="causal")
    y_packed_c = m.apply(deploy, x, mode="packed", mask="causal")
    np.testing.assert_allclose(np.asarray(y_packed_c), np.asarray(y_sim_c),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("s,valid", [(200, 197), (80, 77), (16, 16)])
@pytest.mark.parametrize("causal", [False, True])
def test_mha_rows_kernel_valid_len_masking(rng, s, valid, causal):
    """2-D rows kernel: pad keys (rows >= valid_len) must not influence any
    valid query row — compare against the oracle run on the UNPADDED data."""
    from quantize_tpu.ops.pallas.attention import mha_fused_qkv_rows

    b, h, d = 2, 4, 64
    e = h * d
    qkv = rng.normal(size=(b, valid, 3 * e)).astype(np.float32)
    padded = np.zeros((b, s, 3 * e), np.float32)
    padded[:, :valid] = qkv
    # garbage in the pad rows must be inert
    padded[:, valid:] = 37.0
    out = mha_fused_qkv_rows(jnp.asarray(padded.reshape(b * s, 3 * e)),
                             h, s, causal=causal, valid_len=valid)
    out = np.asarray(out).reshape(b, s, e)[:, :valid]
    ref = _mha_ref(jnp.asarray(qkv), h, causal, jnp.float32)
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_mha_module_2d_rows_matches_3d(rng):
    """QuantMultiheadAttention packed: 2-D rows input == 3-D input."""
    import jax

    from quantize_tpu.deploy import pack_model
    from quantize_tpu.nn.attention import QuantMultiheadAttention
    from quantize_tpu.nn.layers import LayerQuantCfg

    cfg = LayerQuantCfg(
        weight={"n_bits": 8, "symmetric": True, "signed": True,
                "granularity": "channel", "range": {"name": "minmax"}},
        activation={"n_bits": 8, "symmetric": False, "granularity": "layer",
                    "range": {"name": "minmax"}},
    )
    b, s, e = 2, 8, 128
    x = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32))
    m = QuantMultiheadAttention(e, 2, quant=cfg)
    v = dict(m.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    v.pop("taps", None)
    _, upd = m.apply(v, x, mode="calibrate", mutable=["qobs", "qparams"])
    v = {**v, **upd}
    deploy = pack_model(m, v, x)
    y3 = m.apply(deploy, x, mode="packed")
    y2 = m.apply(deploy, x.reshape(b * s, e), mode="packed", seq_len=s)
    np.testing.assert_allclose(np.asarray(y2).reshape(b, s, e),
                               np.asarray(y3), rtol=1e-5, atol=1e-5)


def test_packed_attention_awq_weight_only(rng):
    """AWQ on attention projections (the reference's AWQ config scope,
    configs/runners/ptq/awq/base.yaml): packed deploy falls back to
    per-projection weight-only matmuls (no fused qkv) and must match the
    quant simulation."""
    import jax

    from quantize_tpu.deploy import pack_model
    from quantize_tpu.nn.attention import QuantMultiheadAttention
    from quantize_tpu.nn.layers import LayerQuantCfg

    cfg = LayerQuantCfg(
        weight={"n_bits": 4, "symmetric": True, "signed": True,
                "granularity": "channel",
                "range": {"name": "awq", "grid": 6}},
        activation={"n_bits": 8, "symmetric": False, "granularity": "layer",
                    "range": {"name": "minmax"}},
    )
    x = jnp.asarray(rng.normal(size=(2, 8, 64)).astype(np.float32))
    m = QuantMultiheadAttention(64, 2, quant=cfg)
    v = dict(m.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    v.pop("taps", None)
    _, upd = m.apply(v, x, mode="calibrate", mutable=["qobs", "qparams"])
    v = {**v, **upd}
    y_sim = m.apply(v, x, mode="quant")
    deploy = pack_model(m, v, x)
    # q/k/v carry AWQ reciprocals -> weight-only deploy layout
    assert "awq_recip" in deploy["packed"]["q_proj"]
    y_packed = m.apply(deploy, x, mode="packed")
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_sim),
                               rtol=2e-2, atol=2e-2)


def test_mha_kernel_large_logits_exact(rng):
    """Attention logits far above 60 (trained ViT/CLIP checkpoints produce
    them in some heads) must yield the exact softmax, not a flattened or
    zeroed row — the regression the round-4 fixed +60 clamp had, and the
    regime where a per-(image, head) scalar shift zeroes whole rows (both
    rejected variants are priced in the kernel docstring). With and without
    pad-key masking."""
    from quantize_tpu.ops.pallas.attention import mha_fused_qkv_rows

    b, s, h, d, valid = 2, 40, 2, 64, 37
    e = h * d
    # sigma=6 entries: score std = 36*sqrt(64)/8 = 36 -> row maxima ~ 100+
    qkv = (rng.normal(size=(b, valid, 3 * e)) * 6.0).astype(np.float32)
    padded = np.zeros((b, s, 3 * e), np.float32)
    padded[:, :valid] = qkv
    padded[:, valid:] = 1e4                    # garbage pad rows stay inert
    out = mha_fused_qkv_rows(jnp.asarray(padded.reshape(b * s, 3 * e)),
                             h, s, valid_len=valid, int8_scores=False)
    out = np.asarray(out).reshape(b, s, e)[:, :valid]
    ref = np.asarray(_mha_ref(jnp.asarray(qkv), h, False, jnp.float32))
    scores = np.einsum("bqd,bkd->bqk", qkv[..., :d], qkv[..., e:e + d]) / 8.0
    assert scores.max() > 80, "test inputs must exercise the >60 regime"
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    # full-length (no masking) path as well
    out2 = mha_fused_qkv_rows(
        jnp.asarray(qkv[:, :32].reshape(b * 32, 3 * e)), h, 32,
        int8_scores=False)
    ref2 = np.asarray(_mha_ref(jnp.asarray(qkv[:, :32]), h, False,
                               jnp.float32))
    np.testing.assert_allclose(np.asarray(out2).reshape(b, 32, e), ref2,
                               rtol=2e-4, atol=2e-4)


def test_int8_scores_variant_close_to_oracle(rng):
    """The selectable int8-scores kernel (QTPU_ATTN_INT8=1; measured-slower
    on v5e but kept for A/B — docs/BENCH_NOTES.md round 4): dynamic
    symmetric per-(image, head) quantization must stay within int8 noise of
    the f32 oracle, masked pad keys and causal mode included."""
    from quantize_tpu.ops.pallas.attention import (_mha_ref_rows,
                                                   mha_fused_qkv_rows)

    B, S, E, H, valid = 3, 16, 64, 4, 13
    qkv = jnp.asarray(rng.normal(size=(B * S, 3 * E)).astype(np.float32))
    for causal in (False, True):
        ref = np.asarray(_mha_ref_rows(qkv, H, S, causal, jnp.float32,
                                       valid)).reshape(B, S, E)[:, :valid]
        out = np.asarray(mha_fused_qkv_rows(
            qkv, H, S, causal=causal, valid_len=valid,
            int8_scores=True), np.float32).reshape(B, S, E)[:, :valid]
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < 0.03, f"causal={causal}: rel err {rel:.4f}"


def test_int8_scores_long_sequence_tail(rng):
    """ViT-length sequences (S=200, valid 197) for the int8-scores variant:
    probabilities below ~1/254 of the row max round to zero in the [0,127]
    weight quantization, so long flat tails are truncated — assert the
    aggregate error stays within the documented bound at real ViT shapes,
    not just the short S=16 case."""
    from quantize_tpu.ops.pallas.attention import (_mha_ref_rows,
                                                   mha_fused_qkv_rows)

    B, S, H, D, valid = 2, 200, 4, 64, 197
    E = H * D
    qkv = jnp.asarray(rng.normal(size=(B * S, 3 * E)).astype(np.float32))
    ref = np.asarray(_mha_ref_rows(qkv, H, S, False, jnp.float32,
                                   valid)).reshape(B, S, E)[:, :valid]
    out = np.asarray(mha_fused_qkv_rows(
        qkv, H, S, valid_len=valid, int8_scores=True),
        np.float32).reshape(B, S, E)[:, :valid]
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.05, f"rel err {rel:.4f}"


def test_mha_kernel_large_negative_logits_exact(rng):
    """Rows whose EVERY score is strongly negative (plausible transiently
    under mis-calibrated quantization scales): true softmax is a normal
    distribution over the keys, and the kernel's -80-floored row-max shift
    must reproduce it exactly for row maxima down to -80 — and still
    produce it (not zeros) well below, where the pre-shift weights
    underflow f32 but the shifted ones do not (row maxima here ~ -100)."""
    from quantize_tpu.ops.pallas.attention import mha_fused_qkv_rows

    b, s, h, d = 2, 32, 2, 64
    e = h * d
    w = np.ones(d, np.float32)
    gamma = 3.9  # -gamma^2*d/sqrt(d) ~ -120 mean score, row maxima ~ -100
    qkv = np.zeros((b, s, 3 * e), np.float32)
    for hh in range(h):
        qkv[..., hh * d:(hh + 1) * d] = rng.normal(size=(b, s, d)) + gamma * w
        qkv[..., e + hh * d:e + (hh + 1) * d] = (
            rng.normal(size=(b, s, d)) - gamma * w)
        qkv[..., 2 * e + hh * d:2 * e + (hh + 1) * d] = rng.normal(
            size=(b, s, d))
    scores = np.einsum("bqd,bkd->bqk", qkv[..., :d],
                       qkv[..., e:e + d]) / np.sqrt(d)
    row_max = scores.max(-1)
    assert row_max.max() < -87 and row_max.min() > -167, (
        f"test must exercise the old-kernel underflow regime, "
        f"got [{row_max.min():.0f}, {row_max.max():.0f}]")
    out = mha_fused_qkv_rows(jnp.asarray(qkv.reshape(b * s, 3 * e)),
                             h, s, int8_scores=False)
    ref = np.asarray(_mha_ref(jnp.asarray(qkv), h, False, jnp.float32))
    out = np.asarray(out).reshape(b, s, e)
    assert np.abs(out).max() > 0.01, "kernel must not zero all-negative rows"
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
