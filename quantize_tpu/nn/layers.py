"""Quantization-aware layers (TPU-native layouts: NHWC / HWIO).

These are the functional equivalents of the reference's module twins
(``modelzoo/modules/quantconv2d.py:20``, ``quantlinear.py:17``,
``quantrelu.py:13``, ``quant_pooling.py:16,100``) — but instead of surgery on
a pretrained module tree, models are *built* quantized from config, and FP32
behavior is just the ``'fp32'`` mode (or ``n_bits>=32``).

Per-channel axes in TPU layout: activations are NHWC (channel = -1, the
reference's NCHW dim 1) and weights are HWIO/(in, out) (out-channel = -1, the
reference's OIHW dim 0). Observers take the axis explicitly, so the
reference's transpose gymnastics disappear.

Every layer sows its output into the ``'taps'`` collection (no-op unless the
caller marks ``'taps'`` mutable) — this replaces the reference AdaRound
runner's forward hooks (``runner/adaround.py:74-94``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pallas.qmatmul import (
    pack_int4_splithalf, quant_matmul_w4a8, quant_matmul_w8a8, quant_matmul_wo,
)
from ..ops.qconv import quant_conv2d, quant_conv2d_wo
from ..quant.fakequant import fake_quant
from ..quant.observers import BiasCorrect
from .precision import packed_carry_dtype
from ..quant.pack import pack_int4_pairs, unpack_int4_pairs
from ..quant.qspec import QuantSpec, _freeze
from .quantizer import Quantizer


@dataclasses.dataclass(frozen=True)
class LayerQuantCfg:
    """Resolved per-layer quantization parameters (one reconstruct() row).

    ``weight``/``activation`` are the reference's ``w_setting``/``a_setting``
    dicts; ``bias_correct`` enables the corrector; ``bn_folding`` marks that
    a following BN is folded into this layer at import time (``into_scale``
    folds into the quantizer's static_scale instead of the weight data,
    reference ``quantconv2d.py:115-133``).
    """

    weight: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    activation: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    bias_correct: Union[Mapping[str, Any], bool, None] = None
    bn_folding: Union[Mapping[str, Any], bool, None] = None

    def __post_init__(self):
        object.__setattr__(self, "weight", _freeze(dict(self.weight or {})))
        object.__setattr__(self, "activation", _freeze(dict(self.activation or {})))
        bc = self.bias_correct
        object.__setattr__(self, "bias_correct", _freeze(dict(bc)) if isinstance(bc, Mapping) else bc)
        bf = self.bn_folding
        object.__setattr__(self, "bn_folding", _freeze(dict(bf)) if isinstance(bf, Mapping) else bf)

    @property
    def into_scale(self) -> bool:
        if self.bn_folding and not isinstance(self.bn_folding, bool):
            return bool(dict(self.bn_folding).get("into_scale", False))
        return False

    def bias_correct_kwargs(self) -> dict:
        if isinstance(self.bias_correct, bool) or self.bias_correct is None:
            return {}
        return dict(self.bias_correct)


FP32 = LayerQuantCfg(weight={"n_bits": 32}, activation={"n_bits": 32})

# tap-capture modes: sow the layer INPUT alongside the usual output tap,
# computing in the mapped mode — used by block-wise AdaRound replay
# (reference offloads hook-captured tensors to CPU, runner/adaround.py:131-136)
_TAP_IO_MODES = {"tap_io": "fp32", "tap_io_quant": "quant"}


def _maybe_corrector(cfg: LayerQuantCfg) -> Optional[BiasCorrect]:
    if cfg.bias_correct:
        return BiasCorrect(**cfg.bias_correct_kwargs())
    return None


class _QuantLayerBase(nn.Module):
    """Shared calibrate/correct plumbing for dense & conv layers."""

    def _specs(self, quant: LayerQuantCfg) -> Tuple[QuantSpec, QuantSpec]:
        w_spec = QuantSpec.from_config(dict(quant.weight), "weight", channel_axis=-1)
        a_spec = QuantSpec.from_config(dict(quant.activation), "activation", channel_axis=-1)
        return w_spec, a_spec

    def _run(
        self,
        x: jnp.ndarray,
        kernel: jnp.ndarray,
        bias: Optional[jnp.ndarray],
        mode: str,
        quant: LayerQuantCfg,
        contract: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        bias_reduce: Callable[[jnp.ndarray], jnp.ndarray],
    ) -> jnp.ndarray:
        """The reference ``_forward`` dataflow (``quantconv2d.py:154-168``).

        ``contract(x, w)`` is the layer's linear op (no bias);
        ``bias_reduce`` maps the corrector output to a per-out-channel bias.
        """
        w_spec, a_spec = self._specs(quant)
        w_quantizer = Quantizer(w_spec, awq_in_axis=-2, name="w_quantizer")
        a_quantizer = Quantizer(a_spec, name="a_quantizer")
        corrector = _maybe_corrector(quant)

        if mode == "calibrate":
            a_quantizer(x, mode="calibrate")
            w_quantizer(
                kernel, mode="calibrate",
                pre_act=x, apply_fn=lambda w, a: contract(a, w),
            )
            if corrector is not None:
                ex = self.variable(
                    "qobs", "bias_correct_EX",
                    lambda: corrector.init_state(x.shape[1:]),
                )
                ex.value = corrector.calibrate(ex.value, x)
            xq, wq = a_quantizer(x, mode="fp32"), w_quantizer(kernel, mode="fp32")
        else:
            xq = a_quantizer(x, mode=mode)
            wq = w_quantizer(kernel, mode=mode)

        eff_bias = bias
        if corrector is not None and mode == "quant" and self.has_variable("qobs", "bias_correct_EX"):
            # deltaW = W·static − Ŵ  (reference quantconv2d.py:161-166)
            ori = w_quantizer(kernel, mode="fp32")
            ex_state = self.get_variable("qobs", "bias_correct_EX")
            corr = corrector.correction(ex_state, ori - wq, lambda dw, e: contract(e, dw))
            corr = bias_reduce(corr)
            eff_bias = corr if eff_bias is None else eff_bias + corr

        out = contract(xq, wq)
        if eff_bias is not None:
            out = out + eff_bias
        return out

    # -- pack (deploy export) --------------------------------------------
    def _pack(
        self,
        x: jnp.ndarray,
        kernel: jnp.ndarray,
        bias: Optional[jnp.ndarray],
        quant: LayerQuantCfg,
        contract: Callable,
        bias_reduce: Callable,
        store_weight: Callable[[Callable, jnp.ndarray], None],
    ) -> jnp.ndarray:
        """mode='pack': bake bias correction into the bias, quantize the
        weight to its integer grid, and store deploy buffers in the
        ``packed`` collection (reference ``QuantConv2d.pack``,
        ``quantconv2d.py:170-196``). Returns the FP32 forward so the pack
        pass can flow through the whole network in one apply."""
        w_spec, a_spec = self._specs(quant)
        w_quantizer = Quantizer(w_spec, awq_in_axis=-2, name="w_quantizer")
        a_quantizer = Quantizer(a_spec, name="a_quantizer")
        corrector = _maybe_corrector(quant)
        n_out = kernel.shape[-1]
        pv = lambda name, val: self.put_variable("packed", name, val)  # noqa: E731

        ori = w_quantizer(kernel, mode="fp32")
        eff_bias = bias
        if corrector is not None and self.has_variable("qobs", "bias_correct_EX"):
            wq = w_quantizer(kernel, mode="quant")
            ex_state = self.get_variable("qobs", "bias_correct_EX")
            corr = bias_reduce(
                corrector.correction(ex_state, ori - wq, lambda dw, e: contract(e, dw))
            )
            eff_bias = corr if eff_bias is None else eff_bias + corr
        pv("bias", jnp.zeros((n_out,), jnp.float32) if eff_bias is None
           else jnp.asarray(eff_bias, jnp.float32))

        if w_spec.enabled:
            q, w_scale, w_zero = w_quantizer(kernel, mode="pack")
            # shift unsigned grids into int8 range, folding into the zero
            shift = (1 << (w_spec.n_bits - 1)) if w_spec.qmin >= 0 else 0
            q_i8 = (q - shift).astype(jnp.int8)
            w_zero = jnp.asarray(w_zero, jnp.float32) + shift
            w_scale = jnp.asarray(w_scale, jnp.float32).reshape(-1)
            w_zero = w_zero.reshape(-1)
            if w_scale.size in (1, n_out):
                # per-layer/per-out-channel: broadcast to (n_out,)
                w_scale = jnp.broadcast_to(w_scale, (n_out,))
                w_zero = jnp.broadcast_to(w_zero, (n_out,))
            # else: AWQ q_group_size grid — (n_out * K/g,) group scales stay
            pv("w_scale", w_scale)
            pv("w_zero", w_zero)
            awq = w_quantizer(kernel, mode="awq_vector")
            if awq is not None:
                # deploy dequant divides rows by awq: store the reciprocal
                pv("awq_recip", 1.0 / jnp.asarray(awq, jnp.float32))
            store_weight(pv, q_i8)

        if a_spec.enabled:
            a_scale, a_zero = a_quantizer(x, mode="export_qparams")
            pv("a_scale", jnp.asarray(a_scale, jnp.float32))
            pv("a_zero", jnp.asarray(a_zero, jnp.float32))

        out = contract(x, ori)
        if eff_bias is not None:
            out = out + eff_bias
        return out

    def _packed_act(self, x: jnp.ndarray, a_spec: QuantSpec) -> jnp.ndarray:
        """Fallback activation fake-quant for packed paths that cannot fuse
        (per-channel activation scales)."""
        a_scale = self.get_variable("packed", "a_scale")
        a_zero = self.get_variable("packed", "a_zero")
        return fake_quant(x, a_scale, a_zero, a_spec.qmin, a_spec.qmax, channel_axis=-1)


class QuantDense(_QuantLayerBase):
    """Quantized dense layer (reference QuantLinear, ``quantlinear.py:17``).

    Kernel layout (in, out); weight per-channel = out features, activation
    per-channel = in features (both axis -1 of their tensors).
    """

    features: int
    use_bias: bool = True
    quant: LayerQuantCfg = FP32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    param_dtype: Any = jnp.float32

    def _use_p4(self, k: int, w_spec: QuantSpec) -> bool:
        return w_spec.enabled and w_spec.n_bits <= 4 and k % 2 == 0

    def _packed_forward(self, x: jnp.ndarray, pre_norm=None) -> jnp.ndarray:
        w_spec, a_spec = self._specs(self.quant)
        bias = self.get_variable("packed", "bias")
        k = x.shape[-1]
        p4 = self._use_p4(k, w_spec)

        def norm(x):
            # non-fused fallback: apply the deferred LayerNorm first
            if pre_norm is None:
                return x
            from ..ops.pallas.layernorm import layernorm

            return layernorm(x, *pre_norm, out_dtype=x.dtype)

        if not w_spec.enabled:
            # activation-only quantization: float weights stay in params
            kernel = self.get_variable("params", "kernel")
            x = norm(x)
            xq = self._packed_act(x, a_spec) if a_spec.enabled else x
            return xq @ kernel + bias

        w_scale = self.get_variable("packed", "w_scale")
        w_zero = self.get_variable("packed", "w_zero")
        has_awq = self.has_variable("packed", "awq_recip")
        # symmetric signed weights pack with zero == 0 exactly (no grid
        # shift), so the rowsum(A) correction terms vanish statically
        wz0 = bool(w_spec.symmetric and w_spec.qmin < 0)
        fusable = a_spec.enabled and not a_spec.per_channel and not has_awq
        if fusable:
            a_scale = self.get_variable("packed", "a_scale").reshape(())
            a_zero = self.get_variable("packed", "a_zero").reshape(())
            pre_q = None
            if pre_norm is not None:
                # LN fused with the activation quantize: int8 out of the
                # kernel, no normalized bf16 tensor ever hits HBM
                from ..ops.pallas.layernorm import layernorm_quant_int8

                pre_q = layernorm_quant_int8(x, *pre_norm, a_scale, a_zero,
                                             a_spec.qmin, a_spec.qmax)
            if p4:
                w_p4 = self.get_variable("packed", "w_p4")
                col_sum = (self.get_variable("packed", "col_sum")
                           if self.has_variable("packed", "col_sum") else None)
                return quant_matmul_w4a8(x, a_scale, a_zero, a_spec.qmin, a_spec.qmax,
                                         w_p4, w_scale, w_zero, bias, col_sum,
                                         w_zero_is_zero=wz0, pre_q=pre_q)
            w_int = self.get_variable("packed", "w_int")
            col_sum = self.get_variable("packed", "col_sum")
            return quant_matmul_w8a8(x, a_scale, a_zero, a_spec.qmin, a_spec.qmax,
                                     w_int, w_scale, w_zero, bias, col_sum,
                                     w_zero_is_zero=wz0, pre_q=pre_q)
        # weight-only (or per-channel-activation / AWQ fallback)
        if p4:
            from ..ops.pallas.qmatmul import unpack_int4_splithalf

            w_int = unpack_int4_splithalf(self.get_variable("packed", "w_p4"))
        else:
            w_int = self.get_variable("packed", "w_int")
        x = norm(x)
        xq = self._packed_act(x, a_spec) if a_spec.enabled else x
        awq_recip = self.get_variable("packed", "awq_recip") if has_awq else None
        group = 0
        if has_awq and w_spec.range_name == "awq":
            g = int(dict(w_spec.range_kwargs).get("q_group_size", -1) or -1)
            group = g if g > 0 else 0
        return quant_matmul_wo(xq, w_int, w_scale, w_zero, bias,
                               awq_recip=awq_recip, group_size=group)

    def packed_proj_buffers(self) -> dict:
        """Export this layer's deploy buffers so a parent module can run
        several sibling projections as ONE fused matmul (used by
        :class:`~quantize_tpu.nn.attention.QuantMultiheadAttention` to fuse
        q/k/v — the packed analog of the reference's fused ``in_proj_weight``,
        ``quantmultiheadattention.py:97-104``)."""
        out = {
            "bias": self.get_variable("packed", "bias"),
            "w_scale": self.get_variable("packed", "w_scale"),
            "w_zero": self.get_variable("packed", "w_zero"),
        }
        for name in ("w_int", "w_p4", "col_sum", "a_scale", "a_zero"):
            if self.has_variable("packed", name):
                out[name] = self.get_variable("packed", name)
        return out

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32",
                 pre_norm=None) -> jnp.ndarray:
        if mode in _TAP_IO_MODES:
            self.sow("taps", "in", x)
            mode = _TAP_IO_MODES[mode]
        if mode == "packed":
            out = self._packed_forward(x, pre_norm).astype(packed_carry_dtype())
            self.sow("taps", "out", out)
            return out
        assert pre_norm is None, "pre_norm fusion is a packed-mode feature"

        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features), self.param_dtype)
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias or self.quant.bias_correct
            else None
        )
        contract = lambda a, w: a @ w  # noqa: E731
        if mode == "pack":
            w_spec, _ = self._specs(self.quant)

            def store_weight(pv, q_i8):
                if self._use_p4(kernel.shape[0], w_spec):
                    pv("w_p4", pack_int4_splithalf(q_i8))
                else:
                    pv("w_int", q_i8)
                pv("col_sum", jnp.sum(q_i8.astype(jnp.int32), axis=0))

            return self._pack(x, kernel, bias, self.quant, contract,
                              lambda c: c, store_weight)

        out = self._run(
            x, kernel, bias, mode, self.quant,
            contract=contract,
            bias_reduce=lambda c: c,
        )
        self.sow("taps", "out", out)
        return out


class QuantConv(_QuantLayerBase):
    """Quantized 2-D convolution (reference QuantConv2d, ``quantconv2d.py:20``).

    NHWC input, HWIO kernel. BN folding happens at parameter-import time
    (:mod:`quantize_tpu.models.import_torch`); ``into_scale`` installs the BN
    multiplier as the weight quantizer's static_scale instead.
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    kernel_dilation: Sequence[int] = (1, 1)
    feature_group_count: int = 1
    use_bias: bool = True
    quant: LayerQuantCfg = FP32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    param_dtype: Any = jnp.float32
    return_qinput: bool = False  # packed mode: also return the quantized input
    s2d: bool = False  # packed mode: space-to-depth rewrite of a stride-2 stem

    def _conv(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        return jax.lax.conv_general_dilated(
            x, w,
            window_strides=tuple(self.strides),
            padding=self.padding,
            rhs_dilation=tuple(self.kernel_dilation),
            feature_group_count=self.feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def _use_p4c(self, in_ch: int, w_spec: QuantSpec) -> bool:
        return w_spec.enabled and w_spec.n_bits <= 4 and in_ch % 2 == 0

    def _packed_forward(self, x: jnp.ndarray, residual=None,
                        fuse_relu: bool = False) -> jnp.ndarray:
        w_spec, a_spec = self._specs(self.quant)
        bias = self.get_variable("packed", "bias")
        conv_kw = dict(strides=tuple(self.strides), padding=self.padding,
                       groups=self.feature_group_count)

        def _finish(out):
            # unfused residual tail (structural conditions for the fused
            # kernel unmet): matches the block-level add+relu it replaces
            if residual is None:
                return out
            out = out.astype(packed_carry_dtype()) + residual
            return jax.nn.relu(out) if fuse_relu else out

        if not w_spec.enabled:
            kernel = self.get_variable("params", "kernel")
            xq = self._packed_act(x, a_spec) if a_spec.enabled else x
            out = self._conv(xq, kernel) + bias
            return (out, None) if self.return_qinput else _finish(out)

        w_scale = self.get_variable("packed", "w_scale")
        w_zero = self.get_variable("packed", "w_zero")
        if self.has_variable("packed", "w_p4c"):
            w_int = unpack_int4_pairs(self.get_variable("packed", "w_p4c"), axis=2)
        else:
            w_int = self.get_variable("packed", "w_int")

        if self.has_variable("packed", "awq_recip"):
            # AWQ deploy is weight-only by construction (the kernel stores
            # Q(w·awq); 1/awq folds into the dequantized weight, exactly the
            # dense path's layout — reference awq.py:119-121 never shipped a
            # packed path at all). Activations still fake-quant if enabled.
            awq_recip = self.get_variable("packed", "awq_recip")
            group = 0
            if w_spec.range_name == "awq":
                g = int(dict(w_spec.range_kwargs).get("q_group_size", -1) or -1)
                group = g if g > 0 else 0
            xq = self._packed_act(x, a_spec) if a_spec.enabled else x
            out = quant_conv2d_wo(xq, w_int, w_scale, w_zero, bias,
                                  awq_recip=awq_recip, group_size=group,
                                  **conv_kw)
            if self.return_qinput:
                return out, None
            return _finish(out)

        # depthwise convs (groups == in_channels) are MXU-hostile as int8:
        # device traces on MobileNetV2 showed them at 54% of the packed step
        # and the int8 path running 2x SLOWER than the bf16 forward. Execute
        # the same quantized math on the VPU instead: fake-quant the
        # activation, dequantize the (tiny) depthwise weight, bf16 conv —
        # bit-equal to simulation up to carry rounding.
        in_ch = x.shape[-1]
        depthwise = (self.feature_group_count > 1
                     and self.feature_group_count == in_ch)
        if depthwise and not self.return_qinput and residual is None:
            cdt = packed_carry_dtype()
            # cast in the PRODUCER: the fake-quant chain's output is what
            # materializes at the fusion boundary before this conv — bf16
            # there halves the block's dominant HBM traffic (r4 HLO showed
            # f32[N,H,W,C] carries between every expand epilogue and dw conv)
            xq = (self._packed_act(x, a_spec).astype(cdt)
                  if a_spec.enabled else x.astype(cdt))
            w_deq = (w_int.astype(jnp.float32) + w_zero) * w_scale
            out = jax.lax.conv_general_dilated(
                xq, w_deq.astype(cdt),
                window_strides=tuple(self.strides), padding=self.padding,
                rhs_dilation=tuple(self.kernel_dilation),
                feature_group_count=self.feature_group_count,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ) + bias
            return out.astype(cdt)

        fusable = a_spec.enabled and not a_spec.per_channel
        if fusable:
            a_scale = self.get_variable("packed", "a_scale").reshape(())
            a_zero = self.get_variable("packed", "a_zero").reshape(())
            corr_a = (
                self.get_variable("packed", "corr_a")
                if self.has_variable("packed", "corr_a")
                else None
            )
            from ..ops.pallas.qmatmul import quantize_act_int8

            q_a, z_eff = quantize_act_int8(x, a_scale, a_zero,
                                           a_spec.qmin, a_spec.qmax)
            # zero==0 exactly only for symmetric *signed* grids (unsigned
            # symmetric packs with a +2^(b-1) shift folded into w_zero)
            wz0 = bool(w_spec.symmetric and w_spec.qmin < 0)
            pad_zero = (self.padding.upper() in ("VALID", "SAME")
                        if isinstance(self.padding, str)  # identical for 1x1/s1
                        else tuple(map(tuple, self.padding)) == ((0, 0), (0, 0)))
            if (residual is not None and wz0 and pad_zero
                    and tuple(self.kernel_size) == (1, 1)
                    and tuple(self.strides) == (1, 1)
                    and tuple(self.kernel_dilation) == (1, 1)
                    and self.feature_group_count == 1):
                from ..ops.pallas.qconv1x1 import conv1x1_residual

                return conv1x1_residual(
                    q_a, z_eff, a_scale, w_int, w_scale, bias, residual,
                    relu=fuse_relu, out_dtype=packed_carry_dtype())
            x_sh, pre_q = x, (q_a, z_eff)
            if (self.s2d and tuple(self.strides) == (2, 2) and wz0
                    and self.feature_group_count == 1
                    and not self.return_qinput
                    and not isinstance(self.padding, str)):
                from ..ops.qconv import (s2d_block_padding, s2d_kernel,
                                         space_to_depth)

                kh, kw = w_int.shape[:2]
                bp = s2d_block_padding(kh, kw, list(self.padding),
                                       x.shape[1], x.shape[2])
                if bp is not None and corr_a is not None:
                    # exact rewrite: stride-1 conv over 2x2 depth-stacked
                    # input; pack-time corr_a carries over (same output
                    # grid, zero-padded taps contribute nothing)
                    q_a = space_to_depth(q_a)
                    w_int = s2d_kernel(w_int)
                    conv_kw = dict(strides=(1, 1), padding=bp, groups=1)
                    x_sh, pre_q = q_a, (q_a, z_eff)
            out = quant_conv2d(
                x_sh, a_scale, a_zero, a_spec.qmin, a_spec.qmax,
                w_int, w_scale, w_zero, bias,
                w_zero_is_zero=wz0,
                corr_a=corr_a,
                pre_q=pre_q, out_dtype=packed_carry_dtype(), **conv_kw,
            )
            if self.return_qinput:
                from .qtensor import QTensor

                qin = QTensor(q=q_a, scale=jnp.asarray(a_scale, jnp.float32),
                              z_eff=z_eff)
                return out, qin
            return _finish(out)
        xq = self._packed_act(x, a_spec) if a_spec.enabled else x
        out = quant_conv2d_wo(xq, w_int, w_scale, w_zero, bias, **conv_kw)
        if self.return_qinput:
            return out, None  # non-fusable: no shareable quantized input
        return _finish(out)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32",
                 residual=None, fuse_relu: bool = False) -> jnp.ndarray:
        if mode in _TAP_IO_MODES:
            self.sow("taps", "in", x)
            mode = _TAP_IO_MODES[mode]
        if mode == "packed":
            if residual is not None and self.return_qinput:
                raise ValueError(
                    "QuantConv: residual fusion and return_qinput are "
                    "mutually exclusive (the qin-carry path has no fused "
                    "residual tail)")
            out = self._packed_forward(x, residual, fuse_relu)
            qin = None
            if self.return_qinput:
                out, qin = out
            out = out.astype(packed_carry_dtype())
            self.sow("taps", "out", out)
            return (out, qin) if self.return_qinput else out

        kh, kw = self.kernel_size
        in_ch = x.shape[-1] // self.feature_group_count
        kernel = self.param("kernel", self.kernel_init, (kh, kw, in_ch, self.features), self.param_dtype)
        needs_bias = self.use_bias or self.quant.bias_correct or self.quant.bn_folding
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if needs_bias
            else None
        )
        if mode == "pack":
            w_spec, a_spec = self._specs(self.quant)

            def store_weight(pv, q_i8):
                if self._use_p4c(in_ch, w_spec):
                    pv("w_p4c", pack_int4_pairs(q_i8, axis=2))
                else:
                    pv("w_int", q_i8)
                if a_spec.enabled and not a_spec.per_channel:
                    # pack-time zero-point correction map for this input size
                    from ..ops.qconv import conv_zero_correction_map

                    pv("corr_a", conv_zero_correction_map(
                        q_i8, x.shape[1], x.shape[2],
                        tuple(self.strides), self.padding))

            return self._pack(x, kernel, bias, self.quant, self._conv,
                              lambda c: jnp.mean(c, axis=(0, 1)), store_weight)

        out = self._run(
            x, kernel, bias, mode, self.quant,
            contract=self._conv,
            bias_reduce=lambda c: jnp.mean(c, axis=(0, 1)),  # (H',W',C)->(C,)
        )
        if residual is not None:
            out = out + residual
            if fuse_relu:
                out = jax.nn.relu(out)
        self.sow("taps", "out", out)
        return out


class _ActQuantLayer(nn.Module):
    """Activation-only quantization in front of an op (reference QuantReLU /
    QuantMaxPool2d / QuantAdaptiveAvgPool2d pattern)."""

    quant: LayerQuantCfg = FP32

    def _quantize_in(self, x: jnp.ndarray, mode: str) -> jnp.ndarray:
        mode = _TAP_IO_MODES.get(mode, mode)  # act-only layers carry no V
        a_spec = QuantSpec.from_config(dict(self.quant.activation), "activation", channel_axis=-1)
        q = Quantizer(a_spec, name="a_quantizer")
        if mode == "calibrate":
            q(x, mode="calibrate")
            return q(x, mode="fp32")
        if mode == "pack":
            return q(x, mode="fp32")
        if mode == "packed":
            # activation-only layers need no packed buffers; fake-quant with
            # the stored qparams is already the deploy behavior
            return q(x, mode="quant")
        return q(x, mode=mode)


class QuantReLU(_ActQuantLayer):
    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32") -> jnp.ndarray:
        out = jax.nn.relu(self._quantize_in(x, mode))
        self.sow("taps", "out", out)
        return out


class QuantMaxPool(_ActQuantLayer):
    window: Sequence[int] = (2, 2)
    strides: Sequence[int] = (2, 2)
    padding: Union[str, Sequence[Tuple[int, int]]] = "VALID"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32") -> jnp.ndarray:
        x = self._quantize_in(x, mode)
        out = nn.max_pool(
            x, tuple(self.window), strides=tuple(self.strides), padding=self.padding
        )
        self.sow("taps", "out", out)
        return out


class QuantGlobalAvgPool(_ActQuantLayer):
    """Adaptive average pool to 1x1 (the only variant the reference models use)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32") -> jnp.ndarray:
        x = self._quantize_in(x, mode)
        out = jnp.mean(x, axis=(1, 2))
        self.sow("taps", "out", out)
        return out
