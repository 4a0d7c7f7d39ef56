"""Flax quantizer module: fake-quant with calibration state as variables.

The reference's stateful ``Quantizer`` (``modelzoo/modules/quantizer.py:43``)
with ``calibrating``/``quantized`` Python flags becomes a linen module whose
mode is a *call argument* and whose mutable state lives in named variable
collections:

* ``qparams``  — scale, zero (and optionally static_scale / awq_scale);
  trainable during QAT (reference makes them ``nn.Parameter``).
* ``qobs``     — observer accumulators (running min/max, EMA, ACIQ sums, ...).
* ``adaround`` — the AdaRound ``V`` offsets (the only trainable leaves during
  AdaRound reconstruction).

Modes (matching the reference flag combinations in ``runner/ptq.py:51-63``):

* ``'fp32'``      — pass-through (times static_scale), no state touched.
* ``'calibrate'`` — update observer state and (re)write scale/zero, then
  return the FP32 value (reference calibrates with ``quantized=False`` so
  downstream layers see clean activations).
* ``'quant'``     — simulated quantization with the stored qparams.
* ``'init_adaround'`` — write V from the fractional part (lazy init in the
  reference, ``range/adaround.py:86-88``).

Requires ``mutable=['qobs', 'qparams']`` (and ``'adaround'``) on ``apply``
for the state-writing modes.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..quant.adaround import adaround_round, init_v
from ..quant.fakequant import dequantize_core, fake_quant, quantize_core
from ..quant.observers import build_observer
from ..quant.qspec import QuantSpec, broadcast_to_axis


class Quantizer(nn.Module):
    """One fake-quantizer (for a weight or an activation tensor)."""

    spec: QuantSpec
    awq_in_axis: int = -2  # in-channel axis of the tensor (for AWQ pre-scaling)

    def _awq_group(self) -> int:
        """AWQ q_group_size (0 = per-out-channel, reference ``awq.py:42``)."""
        if self.spec.range_name == "awq":
            g = dict(self.spec.range_kwargs).get("q_group_size", -1)
            if g and int(g) > 0:
                return int(g)
        return 0

    def _n_channels(self, x: jnp.ndarray) -> int:
        g = self._awq_group()
        if g:
            size = 1
            for d in x.shape:
                size *= d
            return size // g
        return self.spec.n_channels(x.shape)

    def _qparams(self, x: jnp.ndarray):
        c = self._n_channels(x)
        scale = self.variable("qparams", "scale", jnp.ones, (c,), jnp.float32)
        zero = self.variable("qparams", "zero", jnp.zeros, (c,), jnp.float32)
        return scale, zero

    def _static_scale(self, x: jnp.ndarray) -> Optional[jnp.ndarray]:
        if not self.has_variable("qparams", "static_scale"):
            return None
        return self.get_variable("qparams", "static_scale")

    def set_static_scale(self, value: jnp.ndarray) -> None:
        """Install a fixed multiplier on the calibrated scale (BN fold-into-scale,
        reference ``quantizer.py:146-151``). Call under mutable=['qparams']."""
        self.put_variable("qparams", "static_scale", jnp.asarray(value, jnp.float32))

    # -- helpers ----------------------------------------------------------
    def _apply_static(self, x: jnp.ndarray) -> jnp.ndarray:
        ss = self._static_scale(x)
        if ss is None:
            return x
        return x * broadcast_to_axis(ss, x.ndim, self.spec.channel_axis)

    def calibrate(
        self,
        x: jnp.ndarray,
        pre_act: Optional[jnp.ndarray] = None,
        apply_fn: Optional[Callable] = None,
    ) -> None:
        """Run one observer step and write scale/zero."""
        spec = self.spec
        observer = build_observer(spec)
        if spec.range_name == "awq":
            n_state = pre_act.shape[-1]  # AWQ state is per in-channel
        else:
            n_state = self._n_channels(x)
        state_var = self.variable("qobs", "state", lambda: observer.init_state(n_state))
        scale, zero = self._qparams(x)

        if spec.range_name == "awq":
            new_state, s, z, awq_scale = observer(
                state_var.value, x, pre_act=pre_act, apply_fn=apply_fn
            )
            self.put_variable("qparams", "awq_scale", awq_scale)
        else:
            new_state, s, z = observer(state_var.value, x)
        state_var.value = new_state
        scale.value = s
        zero.value = z

    # -- modes ------------------------------------------------------------
    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "quant", **calib_kw) -> jnp.ndarray:
        spec = self.spec
        if not spec.enabled:
            return self._apply_static(x)

        if mode == "calibrate":
            self.calibrate(x, **calib_kw)
            return self._apply_static(x)

        if mode == "fp32":
            # touch qparams so variable structure is mode-independent
            self._qparams(x)
            return self._apply_static(x)

        scale, zero = self._qparams(x)
        s, z = scale.value, zero.value
        awq_scale = (
            self.get_variable("qparams", "awq_scale")
            if self.has_variable("qparams", "awq_scale")
            else None
        )

        if mode == "init_adaround":
            if not spec.adaround:
                return self._apply_static(x)
            sb = broadcast_to_axis(s, x.ndim, spec.channel_axis)
            zb = broadcast_to_axis(z, x.ndim, spec.channel_axis)
            self.put_variable("adaround", "V", init_v(x / sb - zb))
            return self._apply_static(x)

        round_fn = None
        if spec.adaround and self.has_variable("adaround", "V"):
            v = self.get_variable("adaround", "V")
            round_fn = lambda t: adaround_round(t, v)  # noqa: E731

        if mode == "export_qparams":
            # Return (scale·static, zero) for the layer's pack step; the
            # reference ``Quantizer.pack`` returns the same contract
            # (``quantizer.py:240-246``).
            ss = self._static_scale(x)
            return (s if ss is None else s * ss), z

        if mode == "pack":
            # Quantize to the integer grid with the layer's rounding
            # (AdaRound-aware) and return (q, scale·static, zero). AWQ packs
            # the *pre-scaled* weight Q(w·awq) — the layer stores 1/awq and
            # folds it into the dequant (weight-only deploy, the same layout
            # llm-serving AWQ kernels use; the reference never shipped this,
            # ``quantizer.py:228-246`` packs non-AWQ only).
            ss = self._static_scale(x)
            g = self._awq_group()
            if awq_scale is not None:
                aws_b = broadcast_to_axis(awq_scale, x.ndim, self.awq_in_axis)
                xs = x * aws_b
                if g:
                    # canonical group view: 2-D (K, N) first (matches the
                    # AWQ observer and the deploy dequant for conv kernels)
                    wg = xs.reshape(-1, xs.shape[-1]).T.reshape(-1, g)
                    q = quantize_core(wg, s, z, spec.qmin, spec.qmax,
                                      channel_axis=0, round_fn=round_fn)
                    q = q.reshape(xs.shape[-1], -1).T.reshape(xs.shape)
                else:
                    q = quantize_core(xs, s, z, spec.qmin, spec.qmax,
                                      spec.channel_axis, round_fn)
                eff = s if ss is None else s * ss
                return jax.lax.stop_gradient(q), eff, z
            q = quantize_core(x, s, z, spec.qmin, spec.qmax, spec.channel_axis, round_fn)
            eff = s if ss is None else s * ss
            return jax.lax.stop_gradient(q), eff, z

        if mode == "awq_vector":
            # bound-method query used by the owning layer at pack time
            return awq_scale

        if mode != "quant":
            raise ValueError(f"unknown quantizer mode {mode!r}")

        ss = self._static_scale(x)
        g = self._awq_group()
        if awq_scale is not None and g:
            # grouped AWQ simulation: scale by awq, quantize per (out, in/g)
            # group row (reference quantizer.py:209-220 with q_group_size)
            aws_b = broadcast_to_axis(awq_scale, x.ndim, self.awq_in_axis)
            xs = x * aws_b
            wg = xs.reshape(-1, xs.shape[-1]).T.reshape(-1, g)
            q = quantize_core(wg, s, z, spec.qmin, spec.qmax, channel_axis=0,
                              round_fn=round_fn)
            deq = dequantize_core(q, s, z, channel_axis=0)
            return deq.reshape(xs.shape[-1], -1).T.reshape(xs.shape) / aws_b
        return fake_quant(
            x, s, z, spec.qmin, spec.qmax,
            channel_axis=spec.channel_axis,
            static_scale=ss,
            awq_scale=awq_scale,
            awq_axis=self.awq_in_axis,
            round_fn=round_fn,
        )

def reset_observers(variables: dict) -> dict:
    """Drop all observer accumulators (the ``qobs`` collection) so the next
    ``mode="calibrate"`` pass restarts every observer from its identity
    state (they are recreated on the fly — ``qobs`` is mutable during
    calibration).

    ``model.init`` necessarily runs one calibrate trace, so observers have
    already ingested the RANDOM init weights and the init batch. After real
    weights are imported (torch checkpoint), those running stats would
    poison the ranges — running min/max keeps the max over init and real
    weights, inflating weight scales wherever the random init was wider
    (caught by ``tests/test_golden_models.py`` scale parity). ``qparams``
    are kept: scale/zero are rewritten on the next calibrate step and
    importer-installed ``static_scale`` entries must survive."""
    return {k: v for k, v in variables.items() if k != "qobs"}


def quantize_with_qparams(x: jnp.ndarray, spec: QuantSpec, qparams: dict) -> tuple:
    """Deploy-path quantization from an exported qparams subtree.

    Returns (q_int, effective_scale, zero) — the reference ``Quantizer.pack``
    contract (``quantizer.py:228-246``), with static_scale folded into the
    returned scale.
    """
    s = qparams["scale"]
    z = qparams["zero"]
    ss = qparams.get("static_scale")
    eff_scale = s if ss is None else s * ss
    q = quantize_core(x, s, z, spec.qmin, spec.qmax, spec.channel_axis)
    return q.astype(spec.storage_dtype), eff_scale, z
