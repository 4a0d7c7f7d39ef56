"""Observer algorithms vs closed-form cases."""
import jax.numpy as jnp
import numpy as np

from quantize_tpu.quant import (
    ACIQ, AWQ, BiasCorrect, CrossEntropy, MAMinMax, MSE, MinMax, QuantSpec,
    build_observer, fake_quant,
)


def wspec(**kw):
    base = dict(n_bits=8, symmetric=True, signed=True, granularity="layer", flag="weight")
    base.update(kw)
    return QuantSpec(**base)


def test_minmax_accumulates_across_batches():
    spec = wspec(symmetric=False)
    obs = MinMax(spec)
    state = obs.init_state(1)
    state, s1, z1 = obs(state, jnp.asarray([0.0, 1.0]))
    state, s2, z2 = obs(state, jnp.asarray([-2.0, 0.5]))
    # accumulated range is [-2, 1] -> scale 3/255
    assert np.isclose(s2, 3.0 / 255)
    assert np.isclose(z2, -2.0 / float(s2[0]))


def test_minmax_symmetric_absmax():
    obs = MinMax(wspec())
    state = obs.init_state(1)
    state, s, z = obs(state, jnp.asarray([-3.0, 1.0]))
    assert np.isclose(s, 3.0 / 127)
    assert z == 0.0


def test_minmax_per_channel():
    spec = wspec(granularity="channel", channel_axis=-1)
    obs = MinMax(spec)
    x = jnp.stack([jnp.asarray([-1.0, 0.5]), jnp.asarray([-4.0, 2.0])], axis=-1)  # (2,2)
    state = obs.init_state(2)
    state, s, z = obs(state, x)
    np.testing.assert_allclose(s, [1.0 / 127, 4.0 / 127], rtol=1e-6)


def test_minmax_percentile_layer():
    # 100 values 0..99, asymmetric, percentile .05 -> xmin=idx5 value, xmax=idx94 value
    spec = wspec(symmetric=False)
    obs = MinMax(spec, percentile=0.05)
    x = jnp.arange(100, dtype=jnp.float32)
    state = obs.init_state(1)
    state, xmin, xmax = obs.range(state, x)
    assert float(xmin[0]) == 5.0  # kth = int(100*.05)+1 = 6th smallest = 5.0
    assert float(xmax[0]) == 94.0  # kth = int(100*.95) = 95th smallest = 94.0


def test_maminmax_momentum():
    obs = MAMinMax(wspec(symmetric=False), momentum=0.5)
    state = obs.init_state(1)
    state, _, _ = obs(state, jnp.asarray([0.0, 1.0]))
    state, _, _ = obs(state, jnp.asarray([0.0, 2.0]))
    # EMA: xmax = .5*2 + .5*1 = 1.5
    assert np.isclose(float(state["xmax"][0]), 1.5)


def test_mse_beats_minmax_with_outlier():
    """One large outlier: MSE grid search should shrink the range and give a
    smaller overall reconstruction error than plain minmax."""
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(size=999).astype(np.float32), [50.0]])
    x = jnp.asarray(x)
    spec = wspec(n_bits=4)
    mm, gs = MinMax(spec), MSE(spec)

    st_m = mm.init_state(1)
    _, s_m, z_m = mm(st_m, x)
    st_g = gs.init_state(1)
    _, s_g, z_g = gs(st_g, x)

    def err(s, z):
        sim = fake_quant(x, s, z, spec.qmin, spec.qmax)
        return float(jnp.sum((x - sim) ** 2))

    assert float(s_g[0]) < float(s_m[0])  # range was shrunk
    assert err(s_g, z_g) < err(s_m, z_m)


def test_mse_per_channel_independent():
    spec = wspec(granularity="channel", channel_axis=0)
    gs = MSE(spec, grid=20)
    x = jnp.stack([jnp.linspace(-1, 1, 256), jnp.linspace(-10, 10, 256)])
    st = gs.init_state(2)
    _, s, z = gs(st, x)
    assert s.shape == (2,)
    assert float(s[1]) > float(s[0])


def test_cross_entropy_runs():
    spec = QuantSpec(n_bits=8, symmetric=False, signed=False, granularity="layer",
                     flag="activation")
    ce = CrossEntropy(spec, grid=10)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(16, 10)).astype(np.float32))
    st = ce.init_state(1)
    st, s, z = ce(st, x)
    assert s.shape == (1,) and np.isfinite(float(s[0]))


def test_aciq_laplace_closed_form():
    """For a single batch, alpha = C(b) * mean|x - mean(x)|."""
    spec = wspec(symmetric=False)
    obs = ACIQ(spec)
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    st = obs.init_state(1)
    st, xmin, xmax = obs.range(st, x)
    mu, lam = 2.5, 1.0
    alpha = ACIQ.C[7] * lam
    assert np.isclose(float(xmin[0]), mu - alpha)
    assert np.isclose(float(xmax[0]), mu + alpha)


def test_aciq_fused_relu():
    spec = wspec(symmetric=False)
    obs = ACIQ(spec, fuse_relu=True)
    x = jnp.asarray([-1.0, 1.0])
    st = obs.init_state(1)
    st, xmin, xmax = obs.range(st, x)
    assert float(xmin[0]) == 0.0
    assert np.isclose(float(xmax[0]), ACIQ.Cf[7] * 1.0, rtol=1e-6)  # mu=0 -> max(mu,0)+alpha


def test_awq_improves_output_mse():
    """AWQ picks a scaling ratio minimizing layer-output error; with skewed
    per-in-channel activations it should do no worse than ratio 0 (plain)."""
    rng = np.random.default_rng(5)
    cin, cout, n = 16, 8, 32
    w = jnp.asarray(rng.normal(size=(cin, cout)).astype(np.float32))
    # heavily skewed activations across in-channels
    act = jnp.asarray((rng.normal(size=(n, cin)) * (10.0 ** rng.uniform(-2, 2, size=(cin,)))).astype(np.float32))
    spec = QuantSpec(n_bits=4, symmetric=True, signed=True, granularity="channel",
                     flag="weight", channel_axis=-1)
    awq = AWQ(spec, grid=20)

    def apply_fn(weight, x):
        return x @ weight

    st = awq.init_state(cin)
    st, s, z, aws = awq(st, w, pre_act=act, apply_fn=apply_fn)
    assert s.shape == (cout,) and aws.shape == (cin,)

    # plain per-channel minmax for comparison
    mm = MinMax(spec)
    _, s0, z0 = mm(mm.init_state(cout), w)
    ref_out = act @ w

    w_awq = fake_quant(w, s, z, spec.qmin, spec.qmax, -1, awq_scale=aws, awq_axis=-2)
    w_mm = fake_quant(w, s0, z0, spec.qmin, spec.qmax, -1)
    err_awq = float(jnp.mean((ref_out - act @ w_awq) ** 2))
    err_mm = float(jnp.mean((ref_out - act @ w_mm) ** 2))
    assert err_awq <= err_mm * 1.001


def test_bias_correct_recovers_shift():
    """If quantization shifts W by deltaW, correction = E[x]·deltaW."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(loc=1.0, size=(64, 8)).astype(np.float32))
    delta_w = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    bc = BiasCorrect(momentum=1.0)  # no EMA: use the batch mean directly
    st = bc.init_state((8,))
    st = bc.calibrate(st, x)
    corr = bc.correction(st, delta_w, lambda dw, ex: ex @ dw)
    expected = jnp.mean(x, axis=0) @ delta_w
    np.testing.assert_allclose(np.asarray(corr), np.asarray(expected), rtol=1e-5)


def test_build_observer_from_spec():
    spec = wspec(range={"name": "mse", "grid": 10})
    obs = build_observer(spec)
    assert isinstance(obs, MSE) and obs.grid == 10


def test_awq_grouped_scales():
    """q_group_size splits each out-channel's in-dims into groups with their
    own scales (reference awq.py:119-121); grouped should fit no worse than
    per-out-channel."""
    rng = np.random.default_rng(9)
    cin, cout, n, g = 32, 8, 16, 8
    w = jnp.asarray(rng.normal(size=(cin, cout)).astype(np.float32))
    act = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    spec = QuantSpec(n_bits=4, symmetric=True, signed=True, granularity="channel",
                     flag="weight", channel_axis=-1)

    def apply_fn(weight, x):
        return x @ weight

    awq_g = AWQ(spec, grid=8, q_group_size=g)
    st = awq_g.init_state(cin)
    st, s, z, aws = awq_g(st, w, pre_act=act, apply_fn=apply_fn)
    assert s.shape == (cin * cout // g,)

    awq_c = AWQ(spec, grid=8)
    st2 = awq_c.init_state(cin)
    _, s2, z2, aws2 = awq_c(st2, w, pre_act=act, apply_fn=apply_fn)

    ref_out = act @ w
    # grouped sim
    wg = (w * aws[:, None]).T.reshape(-1, g)
    sim = fake_quant(wg, s, z, spec.qmin, spec.qmax, channel_axis=0)
    w_g = sim.reshape(cout, cin).T / aws[:, None]
    err_g = float(jnp.mean((ref_out - act @ w_g) ** 2))
    w_c = fake_quant(w, s2, z2, spec.qmin, spec.qmax, -1, awq_scale=aws2, awq_axis=-2)
    err_c = float(jnp.mean((ref_out - act @ w_c) ** 2))
    assert err_g <= err_c * 1.01
