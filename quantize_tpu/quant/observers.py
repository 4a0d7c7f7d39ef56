"""Calibration range observers, re-expressed as pure JAX state transitions.

Each observer mirrors one range estimator of the reference framework
(``modelzoo/modules/range/__init__.py:16-25`` in JingInAI/Quantize) but is a
pure function of ``(state, x) -> (state, scale, zero)`` so calibration can run
under ``jit``/``scan`` without Python-side mutation:

* ``minmax``       — accumulating min/max (``range/minmax.py:10``)
* ``maminmax``     — moving-average min/max (``range/minmax.py:160``)
* ``mse``          — Lp-norm grid search (``range/mse.py:12``)
* ``cross_entropy``— CE grid search for classifier activations (``range/cross_entropy.py:12``)
* ``aciq``         — Laplace-fit analytical clipping (``range/aciq.py:14``)
* ``awq``          — activation-aware weight scaling (``range/awq.py:12``)

plus ``BiasCorrect`` (``range/bias_correct.py:11``) which estimates E[x] to
correct quantization-induced bias. Python grid loops in the reference become
``lax.scan`` over grid points (memory-light, compiled once).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import Registry
from .fakequant import fake_quant
from .qspec import QuantSpec, compute_scale_zero

RANGES = Registry("range observers")

State = Dict[str, jnp.ndarray]


def channel_view(x: jnp.ndarray, channel_axis: int) -> jnp.ndarray:
    """Reshape to (C, M): channel axis first, everything else flattened."""
    x = jnp.moveaxis(x, channel_axis, 0)
    return x.reshape(x.shape[0], -1)


def _kth_smallest(rows: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-th smallest (1-indexed) along the last axis of a (C, M) array."""
    k = max(min(k, rows.shape[-1]), 1)
    srt = jnp.sort(rows, axis=-1)
    return srt[..., k - 1]


class MinMax:
    """Accumulating min/max observer.

    ``percentile > 0`` clips the range to the percentile-th order statistics
    (reference uses torch ``kthvalue``; same indices here via sort).
    """

    name = "minmax"

    def __init__(self, spec: QuantSpec, percentile: float = 0.0, **_):
        self.spec = spec
        self.percentile = float(percentile)

    # -- state ------------------------------------------------------------
    def init_state(self, n_channels: int) -> State:
        return {
            "xmin": jnp.zeros((n_channels,), jnp.float32),
            "xmax": jnp.zeros((n_channels,), jnp.float32),
            "count": jnp.zeros((), jnp.int32),
        }

    def _update(self, state: State, xmin: jnp.ndarray, xmax: jnp.ndarray) -> State:
        seen = state["count"] > 0
        return {
            "xmin": jnp.where(seen, jnp.minimum(state["xmin"], xmin), xmin),
            "xmax": jnp.where(seen, jnp.maximum(state["xmax"], xmax), xmax),
            "count": state["count"] + 1,
        }

    # -- range ------------------------------------------------------------
    def batch_range(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Current-batch (xmin, xmax), shaped (C,) ((1,) for layer gran)."""
        spec = self.spec
        if not spec.per_channel:
            flat = x.reshape(1, -1)
        else:
            flat = channel_view(x, spec.channel_axis)
        n = flat.shape[-1]

        if spec.symmetric:
            xmin = jnp.zeros((flat.shape[0],), x.dtype)
            if self.percentile == 0.0:
                xmax = jnp.max(jnp.abs(flat), axis=-1)
            else:
                xmax = _kth_smallest(jnp.abs(flat), int(n * (1 - self.percentile)))
        else:
            if self.percentile == 0.0:
                xmin = jnp.min(flat, axis=-1)
                xmax = jnp.max(flat, axis=-1)
            else:
                xmin = _kth_smallest(flat, int(n * self.percentile) + 1)
                xmax = _kth_smallest(flat, int(n * (1 - self.percentile)))
        return xmin.astype(jnp.float32), xmax.astype(jnp.float32)

    def range(self, state: State, x: jnp.ndarray) -> Tuple[State, jnp.ndarray, jnp.ndarray]:
        xmin, xmax = self.batch_range(x)
        state = self._update(state, xmin, xmax)
        return state, state["xmin"], state["xmax"]

    def quantize(self, xmin: jnp.ndarray, xmax: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return compute_scale_zero(
            xmin, xmax, self.spec.n_bits, self.spec.symmetric, self.spec.signed
        )

    def __call__(self, state: State, x: jnp.ndarray, **_) -> Tuple[State, jnp.ndarray, jnp.ndarray]:
        state, xmin, xmax = self.range(state, x)
        scale, zero = self.quantize(xmin, xmax)
        return state, scale, zero


class MAMinMax(MinMax):
    """Moving-average min/max: EMA when momentum ∈ [0, 1], else accumulate."""

    name = "maminmax"

    def __init__(self, spec: QuantSpec, percentile: float = 0.0, momentum: float = 0.1, **_):
        super().__init__(spec, percentile)
        self.momentum = float(momentum)

    def _update(self, state: State, xmin: jnp.ndarray, xmax: jnp.ndarray) -> State:
        if not (0.0 <= self.momentum <= 1.0):
            return super()._update(state, xmin, xmax)
        seen = state["count"] > 0
        m = self.momentum
        return {
            "xmin": jnp.where(seen, m * xmin + (1 - m) * state["xmin"], xmin),
            "xmax": jnp.where(seen, m * xmax + (1 - m) * state["xmax"], xmax),
            "count": state["count"] + 1,
        }


class MSE(MAMinMax):
    """Grid-search range shrinking minimizing the Lp reconstruction error.

    Reference defaults (``range/mse.py:36-53``): momentum=-1 (accumulate),
    maxshrink=0.8, grid=100, norm=2.4. The Python grid loop becomes a
    ``lax.scan`` over shrink factors.
    """

    name = "mse"

    def __init__(
        self,
        spec: QuantSpec,
        percentile: float = 0.0,
        momentum: float = -1.0,
        maxshrink: float = 0.8,
        grid: int = 100,
        norm: float = 2.4,
        **_,
    ):
        super().__init__(spec, percentile, momentum)
        self.maxshrink = float(maxshrink)
        self.grid = int(grid)
        self.norm = float(norm)

    def measure(self, x: jnp.ndarray, x_sim: jnp.ndarray) -> jnp.ndarray:
        """Per-element error; reduced per channel (or in total) by caller."""
        return jnp.abs(x - x_sim) ** self.norm

    def _reduce_err(self, err: jnp.ndarray) -> jnp.ndarray:
        if self.spec.per_channel:
            return jnp.sum(channel_view(err, self.spec.channel_axis), axis=-1)
        return jnp.sum(err).reshape(1)

    def grid_search(
        self, x: jnp.ndarray, xmin: jnp.ndarray, xmax: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        spec = self.spec
        n_steps = int(self.maxshrink * self.grid) + 1
        x = x.astype(jnp.float32)

        def body(carry, i):
            best_err, best_scale, best_zero = carry
            p = 1.0 - i.astype(jnp.float32) / self.grid
            s, z = self.quantize(xmin * p, xmax * p)
            sim = fake_quant(x, s, z, spec.qmin, spec.qmax, spec.channel_axis)
            err = self._reduce_err(self.measure(x, sim))
            better = err < best_err
            return (
                jnp.where(better, err, best_err),
                jnp.where(better, s, best_scale),
                jnp.where(better, z, best_zero),
            ), None

        c = xmin.shape[0]
        init = (
            jnp.full((c,), jnp.inf, jnp.float32),
            jnp.ones((c,), jnp.float32),
            jnp.zeros((c,), jnp.float32),
        )
        (best_err, scale, zero), _ = jax.lax.scan(body, init, jnp.arange(n_steps))
        del best_err
        return scale, zero

    def __call__(self, state: State, x: jnp.ndarray, **_) -> Tuple[State, jnp.ndarray, jnp.ndarray]:
        state, xmin, xmax = self.range(state, x)
        scale, zero = self.grid_search(x, xmin, xmax)
        return state, scale, zero


class CrossEntropy(MSE):
    """CE-based grid search for classifier-head activations.

    Layer granularity + activations only (reference ``cross_entropy.py:63-68``).
    The reference applies softmax to both tensors, then torch ``cross_entropy``
    (which re-applies log-softmax to its input) — replicated verbatim.
    """

    name = "cross_entropy"

    def __init__(self, spec: QuantSpec, **kw):
        kw.pop("norm", None)
        super().__init__(spec, **kw)
        if spec.per_channel:
            raise ValueError("cross_entropy observer supports layer granularity only")
        if spec.flag != "activation":
            raise ValueError("cross_entropy observer supports activation quantization only")

    def measure(self, x: jnp.ndarray, x_sim: jnp.ndarray) -> jnp.ndarray:
        p = jax.nn.softmax(x, axis=-1)
        q = jax.nn.log_softmax(jax.nn.softmax(x_sim, axis=-1), axis=-1)
        return -jnp.sum(p * q, axis=-1)


class ACIQ(MinMax):
    """Analytical clipping (ACIQ): α = C(M)·λ from a Laplace fit.

    Hardcoded C tables per bit-width, including the fused-ReLU variant
    (reference ``aciq.py:35-44``). Accumulators (count, Σx, Σ|x−μ|) are carried
    in state; note the reference's sequential quirk — λ accumulates deviations
    against the *running* mean at each step — is preserved.
    """

    name = "aciq"

    C = [1.86, 2.83, 3.90, 5.03, 6.20, 7.41, 8.65, 9.90,
         11.16, 12.44, 13.73, 15.02, 16.33, 17.64, 18.95, 20.27]
    Cf = [2.83, 3.90, 5.03, 6.20, 7.41, 8.65, 9.90, 11.16,
          12.44, 13.73, 15.02, 16.33, 17.64, 18.95, 20.27, 21.59]

    def __init__(self, spec: QuantSpec, fuse_relu: bool = False, **_):
        super().__init__(spec, percentile=0.0)
        self.fuse_relu = bool(fuse_relu)
        self.eff_bits = min(spec.n_bits, 16)

    def init_state(self, n_channels: int) -> State:
        return {
            "num": jnp.zeros((), jnp.float32),
            "mu_sum": jnp.zeros((n_channels,), jnp.float32),
            "lam_sum": jnp.zeros((n_channels,), jnp.float32),
        }

    def range(self, state: State, x: jnp.ndarray) -> Tuple[State, jnp.ndarray, jnp.ndarray]:
        spec = self.spec
        if spec.per_channel:
            flat = channel_view(x, spec.channel_axis)
        else:
            flat = x.reshape(1, -1)
        flat = flat.astype(jnp.float32)

        num = state["num"] + flat.shape[-1]
        mu_sum = state["mu_sum"] + jnp.sum(flat, axis=-1)
        mu = mu_sum / num
        lam_sum = state["lam_sum"] + jnp.sum(jnp.abs(flat - mu[:, None]), axis=-1)
        lam = lam_sum / num
        state = {"num": num, "mu_sum": mu_sum, "lam_sum": lam_sum}

        if not self.fuse_relu:
            alpha = self.C[self.eff_bits - 1] * lam
            return state, mu - alpha, mu + alpha
        alpha = self.Cf[self.eff_bits - 1] * lam
        xmin = jnp.zeros_like(mu)
        return state, xmin, jnp.maximum(mu, 0.0) + alpha


class AWQ(MinMax):
    """Activation-aware weight scaling (AWQ).

    Grid-searches a per-in-channel scaling ``x_mean^r`` (normalized) that
    minimizes the layer-output MSE after quantizing the scaled weight
    (reference ``awq.py:105-135``). Requires channel granularity and weights.

    The caller must pass ``pre_act`` (the layer input, in-channel last) and
    ``apply_fn(weight, pre_act) -> output`` via the observer call kwargs.
    """

    name = "awq"

    def __init__(
        self,
        spec: QuantSpec,
        q_group_size: int = -1,
        grid: int = 20,
        accumulate: bool = True,
        **_,
    ):
        if not spec.per_channel:
            raise ValueError("AWQ only supports channel granularity")
        super().__init__(spec, percentile=0.0)
        self.q_group_size = int(q_group_size)
        self.grid = int(grid)
        self.accumulate = bool(accumulate)

    def init_state(self, n_channels_in: int) -> State:
        # NOTE: state is sized by the IN-channel count (layers pass it).
        return {
            "x_mean": jnp.zeros((n_channels_in,), jnp.float32),
            "num_x": jnp.zeros((), jnp.float32),
        }

    def update_mean(self, state: State, pre_act: jnp.ndarray) -> State:
        """Running mean of |activation| per in-channel (in-channel last)."""
        flat = jnp.abs(pre_act.astype(jnp.float32)).reshape(-1, pre_act.shape[-1]).T
        num = jnp.asarray(flat.shape[-1], jnp.float32)
        x_mean = jnp.mean(flat, axis=-1)
        if not self.accumulate:
            return {"x_mean": x_mean, "num_x": num}
        seen = state["num_x"] > 0
        tot = state["num_x"] + num
        merged = (state["x_mean"] * state["num_x"] + x_mean * num) / tot
        return {
            "x_mean": jnp.where(seen, merged, x_mean),
            "num_x": jnp.where(seen, tot, num),
        }

    def _group_view(self, w: jnp.ndarray) -> jnp.ndarray:
        """(..., in, out) -> (out*K/g, g), K = prod(leading dims): consecutive
        in-dims of one out row share a group (the reference's
        ``_w.reshape(-1, g)`` on (out, in) weights, ``awq.py:119-121``).
        Conv kernels (kh, kw, in, out) canonicalize to 2-D (kh*kw*in, out)
        first, so a group spans g consecutive in-channels of one spatial tap
        — the same canonicalization the quantizer's sim/pack and the deploy
        dequant use."""
        g = self.q_group_size
        w2 = w.reshape(-1, w.shape[-1])
        assert w2.shape[0] % g == 0, (
            "flattened in-features must be divisible by q_group_size"
        )
        return w2.T.reshape(-1, g)

    def _group_unview(self, wg: jnp.ndarray, shape) -> jnp.ndarray:
        n = shape[-1]
        return wg.reshape(n, -1).T.reshape(shape)

    def __call__(
        self,
        state: State,
        w: jnp.ndarray,
        pre_act: jnp.ndarray = None,
        apply_fn: Callable = None,
        **_,
    ):
        """Returns (state, scale, zero, awq_scale).

        ``w`` layout: in-channel on ``awq_axis=-2``... concretely the layers
        pass weights with in-channel second-to-last and out-channel last
        (dense: (in, out); conv: (kh, kw, in, out) flattened by apply_fn).
        """
        assert self.spec.flag == "weight", "AWQ only supports weight quantization"
        assert pre_act is not None and apply_fn is not None
        spec = self.spec

        org_out = apply_fn(w, pre_act)
        state = self.update_mean(state, pre_act)
        x_mean = state["x_mean"]

        grouped = self.q_group_size > 0

        def body(carry, r):
            best_loss, best = carry
            ratio = r.astype(jnp.float32) / self.grid
            aws = jnp.clip(x_mean**ratio, 1e-4, None)
            aws = aws / jnp.sqrt(jnp.max(aws) * jnp.min(aws))
            # scale along in-channel axis (-2 of the weight)
            w_s = w * jnp.expand_dims(aws, -1)
            if grouped:
                wg = self._group_view(w_s)
                if spec.symmetric:
                    xmin = jnp.zeros((wg.shape[0],), jnp.float32)
                    xmax = jnp.max(jnp.abs(wg), axis=1)
                else:
                    xmin = jnp.min(wg, axis=1)
                    xmax = jnp.max(wg, axis=1)
                s, z = self.quantize(xmin, xmax)
                sim = fake_quant(wg, s, z, spec.qmin, spec.qmax, channel_axis=0)
                w_sim = self._group_unview(sim, w_s.shape)
            else:
                xmin, xmax = self.batch_range(w_s)
                s, z = self.quantize(xmin, xmax)
                w_sim = fake_quant(w_s, s, z, spec.qmin, spec.qmax, spec.channel_axis)
            w_sim = w_sim / jnp.expand_dims(aws, -1)
            out = apply_fn(w_sim, pre_act)
            loss = jnp.mean((org_out - out).astype(jnp.float32) ** 2)
            better = loss < best_loss
            new_best = tuple(
                jnp.where(better, n, o) for n, o in zip((s, z, aws), best)
            )
            return (jnp.where(better, loss, best_loss), new_best), None

        if grouped:
            n_scales = int(np.prod(w.shape)) // self.q_group_size
        else:
            n_scales = w.shape[spec.channel_axis]
        init = (
            jnp.asarray(jnp.inf, jnp.float32),
            (
                jnp.ones((n_scales,), jnp.float32),
                jnp.zeros((n_scales,), jnp.float32),
                jnp.ones((x_mean.shape[0],), jnp.float32),
            ),
        )
        (_, (scale, zero, awq_scale)), _ = jax.lax.scan(body, init, jnp.arange(self.grid))
        return state, scale, zero, awq_scale


class BiasCorrect:
    """EMA of E[x] for quantization bias correction.

    ``calibrate`` tracks the batch-mean input; ``correction`` runs the layer
    on E[x] with the weight *error* W·static − Ŵ and averages over batch
    (reference ``bias_correct.py:39-63``).
    """

    name = "bias_correct"

    def __init__(self, momentum: float = 0.1, **_):
        self.momentum = float(momentum)

    def init_state(self, sample_shape: Tuple[int, ...]) -> State:
        return {"EX": jnp.zeros((1, *sample_shape), jnp.float32)}

    def calibrate(self, state: State, x: jnp.ndarray) -> State:
        mean = jnp.mean(x.astype(jnp.float32), axis=0, keepdims=True)
        return {"EX": self.momentum * mean + (1 - self.momentum) * state["EX"]}

    def correction(
        self, state: State, delta_w: jnp.ndarray, apply_fn: Callable
    ) -> jnp.ndarray:
        """bias = mean_batch(apply_fn(delta_w, E[x]))."""
        return jnp.mean(apply_fn(delta_w, state["EX"]), axis=0)


RANGES.register_dict({
    "minmax": MinMax,
    "maminmax": MAMinMax,
    "mse": MSE,
    "cross_entropy": CrossEntropy,
    "aciq": ACIQ,
    "awq": AWQ,
    "bias_correct": BiasCorrect,
})


def build_observer(spec: QuantSpec) -> MinMax:
    """Instantiate the observer named in ``spec.range``."""
    cls = RANGES.lookup(spec.range_name)
    return cls(spec, **spec.range_kwargs)
