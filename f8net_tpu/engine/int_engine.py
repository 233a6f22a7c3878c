"""Integer-only inference engine.

The product of the framework: a jitted forward where every conv/matmul is an
int8 x int8 multiply accumulating in int32, and every requantization is a
compile-time-constant power-of-two shift (round-half-to-even) -- no FP32 and
no 32-bit integer scale factors anywhere on the hot path.

Two execution paths share one graph walk:
  * int_op_only (the real engine): int8/int32 tensors end to end; parity
    target is the reference's converted IntModel on CPU int tensors
    (fix_resnet.py:26-77, fix_mobilenet_v1.py:25-38, fix_mobilenet_v2.py:20-48).
  * float-sim ("integize"): identical integer values carried in float32,
    mirroring the reference's GPU integize mode (fix_resnet.py:78-119).
    Used as a cross-check oracle; must agree bit-for-bit with int_op_only
    while accumulators stay within the f32-exact range.

All fraclens come from the static QuantPlan, so residual-add alignment shifts
and requant amounts are Python ints resolved at trace time.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..nn.quant_layers import avgpool_shift_for
from ..nn.spec import ConvBNSpec
from ..ops.fxp import (
    F32_EXACT_BOUND, fix_quant, requant_f32_eligible, shift_requant,
    shift_requant_f32,
)

INT32_MAX = (1 << 31) - 1


def _conv_int(
    x,
    w,
    spec: ConvBNSpec,
    accum_dtype=jnp.int32,
    pad_value: int = 0,
    exact_f32: bool = False,
):
    """int8 conv with int32 accumulation (maps onto the MXU on TPU).

    pad_value != 0 pre-pads explicitly: with the zero-point repack
    (s8 = u8 - 128) an unsigned zero is -128, not 0, so border taps must pad
    with -128 for the folded compensation 128*colsum(w) to stay exact.

    exact_f32 computes the conv in float32 and rounds back -- bit-exact while
    |accumulator| < 2^24 (depthwise 3x3 of 8-bit operands peaks at
    9*128*127 ~ 1.5e5), and much faster on TPU where integer depthwise convs
    don't map to the MXU but f32 depthwise hits the optimized VPU path.
    Biases must be added afterwards in int32 (they can exceed 2^24).
    """
    ph, pw = spec.padding
    if pad_value != 0 and (ph or pw):
        x = jnp.pad(
            x,
            [(0, 0), (ph, ph), (pw, pw), (0, 0)],
            constant_values=x.dtype.type(pad_value),
        )
        padding = [(0, 0), (0, 0)]
    else:
        padding = [(ph, ph), (pw, pw)]
    if exact_f32:
        # bf16 operands, f32 accumulation: 8-bit values (|v| <= 128, weights
        # <= 127) are exactly representable in bf16, products are computed in
        # f32, and the accumulator stays under 2^24 -- bit-exact at half the
        # materialized-operand traffic of f32 casts
        y = lax.conv_general_dilated(
            x.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            window_strides=spec.stride,
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=spec.groups,
            preferred_element_type=jnp.float32,
        )
        return y.astype(jnp.int32)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=spec.stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=spec.groups,
        preferred_element_type=accum_dtype,
    )


def _dw_taps_f32(x, w, spec: ConvBNSpec, pad_value: int) -> jnp.ndarray:
    """Depthwise conv as an explicit per-tap f32 multiply-add chain.

    Every op is elementwise (pad + static strided slices + mul + add), so
    XLA fuses the whole thing -- together with the following bias add and
    the f32 requant+pack from pack_for -- into ONE loop fusion that reads
    int8 and writes int8: no conv instruction, no materialized bf16 copy of
    the activation, no int32 round trip (the _conv_int exact_f32 route
    pays read-i8 + write/read-bf16 + write-i32 + read-i32 + write-i8).

    Bit-exact: |x8| <= 128 and |w| <= 127 are f32-exact, each product
    <= 128*127, the k*k-tap sum stays far under 2**24, and the caller gates
    on the layer's static requant bound (compute_requant_bounds) so the
    bias add is f32-exact too.  Accumulation order is fixed (tap-major),
    and f32 addition of exact integers is associative below 2**24, so the
    result equals the integer conv exactly.
    """
    kh, kw = spec.kernel
    sh, sw = spec.stride
    ph, pw = spec.padding
    if ph or pw:
        x = jnp.pad(
            x,
            [(0, 0), (ph, ph), (pw, pw), (0, 0)],
            constant_values=x.dtype.type(pad_value),
        )
    n, hp, wp, c = x.shape
    oh = (hp - kh) // sh + 1
    ow = (wp - kw) // sw + 1
    wf = w.astype(jnp.float32)  # [kh, kw, 1, C]
    acc = None
    for ky in range(kh):
        for kx in range(kw):
            xs = lax.slice(
                x,
                (0, ky, kx, 0),
                (n, ky + (oh - 1) * sh + 1, kx + (ow - 1) * sw + 1, c),
                (1, sh, sw, 1),
            )
            t = xs.astype(jnp.float32) * wf[ky, kx, 0]
            acc = t if acc is None else acc + t
    return acc  # f32 with integral values


def _s2d_eligible(spec: ConvBNSpec, x_shape) -> bool:
    """Space-to-depth head transform: odd-k stride-2 SAME convs over tiny
    channel counts (the C=3 stem) re-expressed as stride-1 convs over 4C
    channels.  XLA's conv emitters are pathological at C=3 (measured
    ~0.6 TFLOP/s on the MBv2 head); at C=12 they tile normally.  Bit-exact:
    integer values accumulate exactly in f32 regardless of order."""
    kh, kw = spec.kernel
    return (
        spec.groups == 1
        and spec.in_ch <= 8  # stems only: at real channel counts the 4x
        and kh >= 3          # channel expansion with 3/4-zero weights loses
        and spec.stride == (2, 2)
        and kh == kw
        and kh % 2 == 1
        and spec.padding == ((kh - 1) // 2,) * 2
        and x_shape[1] % 2 == 0
        and x_shape[2] % 2 == 0
    )


def _space_to_depth(x):
    n, h, w, c = x.shape
    v = x.reshape(n, h // 2, 2, w // 2, 2, c)
    v = v.transpose(0, 1, 3, 2, 4, 5)
    return v.reshape(n, h // 2, w // 2, 4 * c)


def _conv_int_s2d(x, w, spec: ConvBNSpec, exact_f32: bool):
    """conv_k(x; stride 2, SAME zero pads) == conv_k'(s2d(x); stride 1,
    asymmetric pads) with rearranged weights: original tap dy maps to
    (a, ey) with ey = (dy-p) % 2, a = (dy-p-ey)/2, so input row 2y+dy-p is
    s2d row y+a at phase ey.  k' = a_max-a_min+1 (7->4, 3->2), padding
    (-a_min, a_max).  Weight slots with no original tap stay zero."""
    kh = spec.kernel[0]
    p = (kh - 1) // 2
    c = x.shape[3]
    o = w.shape[3]
    a_min = (-p - ((-p) % 2)) // 2
    a_max = (p - p % 2) // 2
    kp = a_max - a_min + 1
    ws = jnp.zeros((kp, kp, 4 * c, o), w.dtype)
    for dy in range(kh):
        ey, ay = (dy - p) % 2, (dy - p - (dy - p) % 2) // 2
        for dx in range(kh):
            ex, ax = (dx - p) % 2, (dx - p - (dx - p) % 2) // 2
            ws = ws.at[
                ay - a_min, ax - a_min, (ey * 2 + ex) * c : (ey * 2 + ex + 1) * c, :
            ].set(w[dy, dx])
    xs = _space_to_depth(x)
    pad = [(-a_min, a_max), (-a_min, a_max)]
    if exact_f32:
        y = lax.conv_general_dilated(
            xs.astype(jnp.bfloat16),
            ws.astype(jnp.bfloat16),
            (1, 1),
            pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return y.astype(jnp.int32)
    return lax.conv_general_dilated(
        xs, ws, (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _conv_int_s2d_pad(x, w, spec: ConvBNSpec, exact_f32: bool, pad_value: int):
    """Space-to-depth stem conv with EXPLICIT padding (supports the -128
    zero-point pad, so the standard colsum compensation stays valid).

    Pad (p, p+2) per spatial dim makes the padded extent even; in padded
    coords out(x) reads cols 2x+dx, so tap dx maps to (a, e) = (dx//2,
    dx%2) -- a VALID conv with kernel (k+1)//2 over 4C channels whose
    output's leading H/2 x W/2 block is exactly the original conv."""
    kh = spec.kernel[0]
    p = (kh - 1) // 2
    n, h, wd, c = x.shape
    o = w.shape[3]
    xp = jnp.pad(
        x,
        [(0, 0), (p, p + 2), (p, p + 2), (0, 0)],
        constant_values=x.dtype.type(pad_value),
    )
    kp = (kh + 1) // 2
    ws = jnp.zeros((kp, kp, 4 * c, o), w.dtype)
    for dy in range(kh):
        ey, ay = dy % 2, dy // 2
        for dx in range(kh):
            ex, ax = dx % 2, dx // 2
            ws = ws.at[
                ay, ax, (ey * 2 + ex) * c : (ey * 2 + ex + 1) * c, :
            ].set(w[dy, dx])
    xs = _space_to_depth(xp)
    if exact_f32:
        y = lax.conv_general_dilated(
            xs.astype(jnp.bfloat16),
            ws.astype(jnp.bfloat16),
            (1, 1),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
    else:
        y = lax.conv_general_dilated(
            xs, ws, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    return y[:, : h // 2, : wd // 2, :]


def _conv_float(x, w, spec: ConvBNSpec):
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=spec.stride,
        padding=[(spec.padding[0],) * 2, (spec.padding[1],) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=spec.groups,
    )


def _maxpool(x, kernel, stride, padding, impl: str = "single"):
    """Max pooling; all impls are value-identical (max is associative and
    commutative, padding is the dtype's -inf):
      'single'    one KxK reduce_window
      'separable' Kx1 then 1xK passes (fewer max ops, one extra round trip)
      'sliced'    elementwise max over K^2 strided slices (no reduce_window)
    """
    init = jnp.iinfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf
    if impl == "separable":
        y = lax.reduce_window(
            x, jnp.asarray(init, x.dtype), lax.max,
            (1, kernel, 1, 1), (1, stride, 1, 1),
            [(0, 0), (padding, padding), (0, 0), (0, 0)],
        )
        return lax.reduce_window(
            y, jnp.asarray(init, x.dtype), lax.max,
            (1, 1, kernel, 1), (1, 1, stride, 1),
            [(0, 0), (0, 0), (padding, padding), (0, 0)],
        )
    if impl == "sliced":
        xp = jnp.pad(
            x, [(0, 0), (padding, padding), (padding, padding), (0, 0)],
            constant_values=jnp.asarray(init, x.dtype),
        )
        n, hp, wp, c = xp.shape
        oh = (hp - kernel) // stride + 1
        ow = (wp - kernel) // stride + 1
        out = None
        for dy in range(kernel):
            for dx in range(kernel):
                v = lax.slice(
                    xp, (0, dy, dx, 0),
                    (n, dy + (oh - 1) * stride + 1, dx + (ow - 1) * stride + 1, c),
                    (1, stride, stride, 1),
                )
                out = v if out is None else jnp.maximum(out, v)
        return out
    return lax.reduce_window(
        x,
        jnp.asarray(init, x.dtype),
        lax.max,
        (1, kernel, kernel, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


class IAct:
    """Integer activation: int32 at fraclen `fl`, or an int8 operand already
    packed (requantized + zero-point shifted) for a specific consumer.

    `abs_bound` is a STATIC (Python int) proof about the values: |x| <=
    abs_bound, derived from the producing layer's baked weights/bias and
    propagated through relu/maxpool/adds.  It licenses the bit-exact f32
    requant epilogue (ops/fxp.py requant_f32_eligible) on the 1x1-dominated
    paths where the integer requant chain is the measured bottleneck."""

    __slots__ = ("x", "fl", "packed_for", "abs_bound", "scaled")

    def __init__(self, x, fl, packed_for=None, abs_bound=None, scaled=False):
        self.x = x
        self.fl = fl
        self.packed_for = packed_for
        self.abs_bound = abs_bound
        # scaled=True: `x` holds the REAL value acc*2^-fl as bf16 (the
        # relaxed-boundary throughput mode, bf16_boundary) instead of the
        # int32 accumulator.  Only multi-consumer boundary tensors take
        # this form; fused int8 chains are identical in both modes.
        self.scaled = scaled


class _Walker:
    """Shared graph walk for both engine dtypes.

    The integer path uses a requant-at-output dataflow: when a conv's output
    feeds exactly one conv, the shift-requant + int8 pack is fused into the
    producer's epilogue so the activation materializes in HBM as 1 byte/elt
    (vs 4 for int32, 2 for bf16) -- the bandwidth lever that lets int8 beat
    the bf16 baseline.  Values are bit-identical either way (ReLU between
    convs is absorbed exactly by the unsigned requant clamp)."""

    def __init__(
        self,
        model,
        plan,
        int_params,
        cfg,
        int_only: bool,
        int8_operands: bool = True,
        use_pallas: bool = False,
        f32_taps: int = 0,
        border_bias: bool = False,
        stem_s2d: bool = False,
        dw_int: bool = False,
        dw_taps: bool = False,
        mxu_bf16: str = "",
        bf16_boundary: bool = False,
        int8_boundary: bool = False,
        fuse_ir: bool = False,
        requant_bounds=None,
        requant_log=None,
    ):
        self.model = model
        self.graph = model.graph
        self.plan = plan
        self.params = int_params
        self.cfg = cfg
        self.int_only = int_only
        self.int8_operands = int8_operands
        self.use_pallas = use_pallas
        # convs whose kh*kw*(C/groups) <= f32_taps also use the f32-exact
        # path (the bound for bit-exactness is 1024: taps*128*127 < 2^24)
        self.f32_taps = min(f32_taps, 1024)
        # zero-point handling for unsigned-input padded convs: True replaces
        # the explicit -128 pad copy with conv-internal zero padding plus a
        # position-dependent border-bias map (see _border_bias) -- bit-exact,
        # saves a full HBM round trip of the activation per conv
        self.border_bias = border_bias
        self.stem_s2d = stem_s2d
        # depthwise via the s8/s32 int conv instead of the exact-f32 VPU
        # detour -- bit-exact either way (identical integer results); an
        # attribution/A-B knob (scripts/mbv2_attrib.py found the hybrid's
        # s32 depthwise cheap while the engine lags)
        self.dw_int = dw_int
        # depthwise as a fused f32 tap chain (see _dw_taps_f32); requires
        # requant_bounds for the exactness gate
        self.dw_taps = dw_taps
        # bf16-OPERAND convs on the MXU for bound-eligible dense convs:
        # '' off, '1x1' pointwise only, 'eligible' every qualifying conv.
        # int8 values are exact in bf16 (|v| <= 128 < 2^8 significand), MXU
        # products accumulate in f32, and f32 integer accumulation is exact
        # below 2^24 -- the SAME static bound (128*sum|w| + |b|, computed
        # from the baked params) that licenses the f32 requant epilogue, so
        # the conv is bit-identical to the s8->s32 form wherever the gate
        # passes.  Motivation: the chip has no int8 MXU rate advantage and
        # XLA has no s8 conv emitters (s32 convs, docs/BENCHMARKS.md); with
        # the requant epilogue already f32, the remaining 1x1 deficit is the
        # s32 conv emitter itself, and this runs those layers through the
        # same bf16 emitters the baseline uses.
        self.mxu_bf16 = mxu_bf16
        # RELAXED-BOUNDARY THROUGHPUT MODE (opt-in; the ONLY non-bit-exact
        # engine mode, and clearly flagged as such).  Multi-consumer
        # boundary tensors (residual carries, the ResNet stem/maxpool)
        # materialize as bf16 REAL VALUES (2 B/elt) instead of the
        # reference's int32 accumulators (4 B/elt, fix_resnet.py:40-76),
        # and residual adds run in bf16 instead of int32-saturating
        # arithmetic.  Fused int8 conv chains -- operands, s32 accumulation,
        # requant grids -- are IDENTICAL to the bit-exact engine; what
        # changes is only the carry precision at block boundaries (bf16's
        # 8-bit mantissa vs exact int32), i.e. the semantics of the
        # reference's own 'integize' float simulation executed at int8
        # speed.  The r4 attribution ladder bounds the win: hybrids with
        # 2-byte boundaries beat bf16 by 13-18% on R50 where the bit-exact
        # engine pays 0.82 (docs/BENCHMARKS.md round-4).
        self.bf16_boundary = bf16_boundary
        # INT8-BOUNDARY THROUGHPUT MODE (opt-in, non-bit-exact like
        # bf16_boundary but 1 B/elt): multi-consumer boundaries requantize
        # ONCE onto the next conv's QAT input grid (the grid the trained
        # model already assumes for that activation) and residual adds widen
        # the 1-byte carry back to int32, align, add, and repack -- the
        # standard production-int8 residual dataflow (e.g. TFLite), priced
        # by the r4 attribution ladders (hybrid B: 1-byte boundaries beat
        # bf16 by 13-15% on R50/MBv1).  vs bf16_boundary: half the carry
        # bytes and an int8 stem/maxpool, one extra rounding per addend at
        # the consumer's 8-bit grid.
        self.int8_boundary = int8_boundary
        assert not (bf16_boundary and int8_boundary)
        # FUSED INVERTED-RESIDUAL BLOCKS (Pallas, ops/pallas_ir_block.py):
        # expand->dw->project execute in one kernel keeping the expanded
        # activation in VMEM; bit-identical to the per-layer path junction
        # by junction (tests/test_pallas_ir.py).  Eligibility decided per
        # block in _block_mbv2_int.
        self.fuse_ir = fuse_ir
        # {layer: static |acc+bias| bound} from the baked params (computed
        # OUTSIDE jit by IntEngine; None disables the f32 requant fast path)
        self.requant_bounds = requant_bounds
        # optional audit sink: pack_for appends (consumer, 'f32'|'int',
        # abs_bound) per requant decision -- decisions are trace-time static,
        # so one abstract trace (audit_requant_forms) captures them all
        self.requant_log = requant_log

    # -- integer path -------------------------------------------------------

    def pack_for(self, act: IAct, name: str) -> IAct:
        """Requantize an int32 activation to `name`'s 8-bit input format and
        pack it as a conv operand (s8 = u8 - 128 for unsigned inputs).
        The requant runs even at equal fraclens: the reference always clamps
        (int_op_only_fix_quant with net 0, fix_quant_ops.py:90-114)."""
        if act.packed_for is not None:
            if act.packed_for == name:
                return act
            # int8-boundary mode: one packed tensor may feed several convs
            # (e.g. a ResNet carry feeding body[0] AND the shortcut).  If the
            # grids coincide the tensor is directly reusable; otherwise
            # widen and requant 1-byte -> 1-byte (trace-time decision).
            assert self.int8_boundary, (act.packed_for, name)
            src = self.plan[act.packed_for]
            pl = self.plan[name]
            if (src.input_fl, src.input_symmetric) == (
                pl.input_fl, pl.input_symmetric
            ):
                return IAct(act.x, act.fl, packed_for=name)
            return self.pack_for(self._widen(act), name)
        pl = self.plan[name]
        if act.scaled:
            # relaxed-boundary mode: quantize the bf16 real value straight
            # onto the consumer's 8-bit grid (round-half-even + clamp --
            # the same rule as fix_quant; the unsigned clamp absorbs ReLU)
            v = jnp.round(act.x.astype(jnp.float32) * float(2.0**pl.input_fl))
            if pl.input_symmetric:
                v8 = jnp.clip(v, -127, 127).astype(jnp.int8)
            else:
                v8 = (jnp.clip(v, 0, 255) - 128).astype(jnp.int8)
            if self.requant_log is not None:
                self.requant_log.append((name, "bf16-scaled", None))
            return IAct(v8, pl.input_fl, packed_for=name)
        rq = shift_requant
        if (
            act.abs_bound is not None
            and requant_f32_eligible(
                act.abs_bound, pl.input_fl, act.fl, 8, pl.input_symmetric
            )
        ):
            # bit-exact f32 requant: at 1x1 arithmetic intensity the integer
            # shift/round chain is the measured epilogue bottleneck
            # (docs/BENCHMARKS.md round-3 SoL table)
            rq = shift_requant_f32
        if self.requant_log is not None:
            self.requant_log.append(
                (name, "f32" if rq is shift_requant_f32 else "int", act.abs_bound)
            )
        v = rq(act.x, 8, pl.input_fl, act.fl, pl.input_symmetric)
        if not self.int8_operands:
            return IAct(v, pl.input_fl, packed_for=name)
        if pl.input_symmetric:
            v8 = v.astype(jnp.int8)
        else:
            v8 = (v - 128).astype(jnp.int8)
        return IAct(v8, pl.input_fl, packed_for=name)

    def _widen(self, act: IAct) -> IAct:
        """Packed int8 operand -> its int32 grid value (exact: undo the
        s8 = u8 - 128 offset for unsigned grids).  Used by the int8-boundary
        residual adds and grid repacks; the value sits on the packed grid's
        fraclen with |v| <= 255."""
        assert act.packed_for is not None
        pl = self.plan[act.packed_for]
        v = act.x.astype(jnp.int32)
        if not pl.input_symmetric:
            v = v + 128
        return IAct(v, pl.input_fl, abs_bound=256)

    def _pallas_eligible(self, spec) -> bool:
        """use_pallas modes: False/'' off; 'all' routes every dense conv
        through the Pallas kernels (and depthwise through the VPU kernel,
        see conv_int); 'dw' routes ONLY depthwise convs to the VPU kernel
        and keeps dense convs on XLA; '1x1' routes only the 1x1 stride-1 GEMM
        convs (the shapes where the big-M Pallas GEMM measures faster than
        XLA's s32 conv: 219 vs 84 TOP/s at K=128, 203 vs 177 at K=576 --
        results/r2_gemm_probe.jsonl) and keeps KxK convs on XLA."""
        if not self.use_pallas or not self.int8_operands:
            return False
        if self.use_pallas == "dw":  # depthwise-only mode: dense stays XLA
            return False
        if spec.groups != 1 or spec.in_ch < 16:
            return False
        if self.use_pallas == "1x1":
            return (
                spec.kernel == (1, 1)
                and spec.stride == (1, 1)
                and spec.padding == (0, 0)
            )
        return (
            spec.stride[0] == spec.stride[1]
            and spec.stride[0] in (1, 2)
            and spec.padding[0] == spec.padding[1]
        )

    def _dense0(self, x, w, spec, exact_f32):
        """Dense conv with native zero padding; stride-2 tiny-C stems take
        the bit-exact space-to-depth route (see _s2d_eligible)."""
        if _s2d_eligible(spec, x.shape):
            return _conv_int_s2d(x, w, spec, exact_f32)
        return _conv_int(x, w, spec, exact_f32=exact_f32)

    def conv_int(self, name: str, act: IAct, pack_output_for=None) -> IAct:
        """int8 conv with int32 accumulation; optionally fuses the output
        requant+pack for a (unique) consumer conv.

        With use_pallas, dense convs execute through the implicit-GEMM Pallas
        kernel whose epilogue truly fuses bias + ReLU-absorbing requant +
        int8 pack (ops/pallas_conv.py); depthwise and tiny-C convs keep the
        XLA path."""
        pl = self.plan[name]
        spec = self.graph[name]
        act = self.pack_for(act, name)
        p = self.params[name]

        # f32-exact fast path: depthwise convs (no MXU win in int) and
        # tiny-C heads (XLA's int conv is pathological at C=3: measured 5 ms
        # of a 15 ms MobileNetV2 at batch 256).  Exact while
        # taps * 128 * 127 < 2^24 (heads: 7*7*3 taps << the bound); dense
        # 1x1/3x3 convs with real channel counts stay on the int8 matmul path.
        kh, kw = spec.kernel
        taps = kh * kw * (spec.in_ch // spec.groups)
        bound = self._bound(name)
        mxu_ok = (
            bool(self.mxu_bf16)
            and self.int8_operands
            and spec.groups == 1
            and bound is not None
            and bound < F32_EXACT_BOUND  # exactness regime ONLY: the
            # saturation regime licenses the f32 REQUANT of an exact int32
            # accumulator, but an f32-accumulated conv past 2^24 is itself
            # inexact, so it cannot ride that proof
            and (self.mxu_bf16 == "eligible" or (kh, kw) == (1, 1))
        )
        exact_f32 = (
            (spec.is_depthwise and not self.dw_int)
            or spec.in_ch <= 8
            or taps <= self.f32_taps
            or mxu_ok
        )

        if (
            spec.is_depthwise
            and self.int8_operands
            and self.use_pallas in (True, "all", "dw")
            and kh == kw
            # stride-1 only: Mosaic rejects strided vector extracts
            # (vector.extract_strided_slice strides must be 1), so stride-2
            # depthwise stays on the XLA exact-f32 path
            and spec.stride == (1, 1)
            and spec.padding[0] == spec.padding[1]
        ):
            # VPU depthwise kernel: int8 in/out, fused bias + requant
            # (ops/pallas_dw.py) -- the whole layer stays at 1 byte/element
            import os as _os

            from ..ops.pallas_dw import pallas_depthwise_int8

            _dw_compute = _os.environ.get("F8NET_PALLAS_DW_COMPUTE", "i32")
            pallas_depthwise_int8 = functools.partial(  # noqa: F811
                pallas_depthwise_int8, compute=_dw_compute
            )

            if pl.input_symmetric:
                b, pad_value = p["b"], 0
            else:
                b = p.get("b_zp")
                if b is None:
                    b = p["b"] + 128 * jnp.sum(
                        p["w"].astype(jnp.int32), axis=(0, 1, 2)
                    )
                pad_value = -128
            if pack_output_for is not None:
                cons = self.plan[pack_output_for]
                y8 = pallas_depthwise_int8(
                    act.x, p["w"], b,
                    stride=spec.stride[0], padding=spec.padding[0],
                    pad_value=pad_value, epilogue="requant8",
                    net=pl.out_fl - cons.input_fl,
                    out_signed=cons.input_symmetric,
                )
                return IAct(y8, cons.input_fl, packed_for=pack_output_for)
            y = pallas_depthwise_int8(
                act.x, p["w"], b,
                stride=spec.stride[0], padding=spec.padding[0],
                pad_value=pad_value, epilogue="int32",
            )
            return IAct(y, pl.out_fl)

        if (
            spec.is_depthwise
            and self.dw_taps
            and self.int8_operands
            and self._bound(name) is not None
            and self._bound(name) < F32_EXACT_BOUND
        ):
            # depthwise as a fused f32 tap chain (one XLA loop fusion, int8
            # in / int8 out); gated on the layer's static requant bound so
            # every f32 step -- incl. the bias add -- is provably exact
            if pl.input_symmetric:
                b, pad_value = p["b"], 0
            else:
                b = p.get("b_zp")
                if b is None:
                    b = p["b"] + 128 * jnp.sum(
                        p["w"].astype(jnp.int32), axis=(0, 1, 2)
                    )
                pad_value = -128
            acc = _dw_taps_f32(act.x, p["w"], spec, pad_value)
            y = (acc + b.astype(jnp.float32)).astype(jnp.int32)
            return self._emit(y, pl, name, pack_output_for)

        if (
            self.stem_s2d
            and self.int8_operands
            and spec.groups == 1
            and spec.in_ch <= 8
            and kh == kw
            and kh % 2 == 1
            and kh >= 3
            and spec.stride == (2, 2)
            and spec.padding == ((kh - 1) // 2,) * 2
            and act.x.shape[1] % 2 == 0
            and act.x.shape[2] % 2 == 0
        ):
            # tiny-C stride-2 stem: space-to-depth with explicit pads (the
            # C=3 conv runs ~0.6 TFLOP/s through XLA's emitters; at 4C=12 it
            # tiles normally).  Explicit -128 pads keep the plain colsum
            # zero-point compensation valid.
            if pl.input_symmetric:
                b, pv = p["b"], 0
            else:
                b = p.get("b_zp")
                if b is None:
                    b = p["b"] + 128 * jnp.sum(
                        p["w"].astype(jnp.int32), axis=(0, 1, 2)
                    )
                pv = -128
            y = _conv_int_s2d_pad(act.x, p["w"], spec, exact_f32, pv) + b
            if pack_output_for is None and self.bf16_boundary:
                return self._emit(y, pl, name, None)
            out = IAct(y, pl.out_fl)
            if pack_output_for is not None:
                out = self.pack_for(out, pack_output_for)
            return out

        if self._pallas_eligible(spec):
            if pl.input_symmetric:
                b, pad_value = p["b"], 0
            else:
                b = p.get("b_zp")
                if b is None:
                    b = p["b"] + 128 * jnp.sum(p["w"].astype(jnp.int32), axis=(0, 1, 2))
                pad_value = -128

            is_1x1 = spec.kernel == (1, 1) and spec.stride == (1, 1) and spec.padding == (0, 0)
            if is_1x1:
                # 1x1 convs are plain GEMMs (no im2col): the Pallas int8 GEMM
                # with fused requant epilogue, M = N*H*W.  pallas_xla_epilogue
                # is a diagnostic: GEMM emits int32 and the requant runs as an
                # XLA fusion instead (isolates kernel-epilogue VPU cost).
                import os as _os

                from ..ops.pallas_gemm import int8_gemm

                xla_epi = _os.environ.get("F8NET_PALLAS_XLA_EPILOGUE") == "1"
                dot_impl = _os.environ.get("F8NET_PALLAS_DOT", "s8")
                if _os.environ.get("F8NET_PALLAS_GEMM") == "v2":
                    import functools as _ft

                    from ..ops.pallas_gemm_v2 import int8_gemm_v2

                    int8_gemm = _ft.partial(  # noqa: F811
                        int8_gemm_v2, wt=_os.environ.get("F8NET_PALLAS_WT") == "1"
                    )
                n_, h_, w_, c_ = act.x.shape
                x2 = act.x.reshape(n_ * h_ * w_, c_)
                w2 = p["w"].reshape(c_, spec.out_ch)
                if pack_output_for is not None and not xla_epi:
                    cons = self.plan[pack_output_for]
                    y2 = int8_gemm(
                        x2, w2, b, epilogue="requant8",
                        net=pl.out_fl - cons.input_fl,
                        out_signed=cons.input_symmetric,
                        bm=2048, bn=512, bk=1024, dot_impl=dot_impl,
                    )
                    y8 = y2.reshape(n_, h_, w_, spec.out_ch)
                    return IAct(y8, cons.input_fl, packed_for=pack_output_for)
                y2 = int8_gemm(x2, w2, b, epilogue="int32", bm=2048, bn=512, bk=1024, dot_impl=dot_impl)
                out = IAct(y2.reshape(n_, h_, w_, spec.out_ch), pl.out_fl)
                if pack_output_for is not None:
                    out = self.pack_for(out, pack_output_for)
                return out

            from ..ops.pallas_conv import pallas_conv_int8

            if pack_output_for is not None:
                cons = self.plan[pack_output_for]
                y8 = pallas_conv_int8(
                    act.x, p["w"], b,
                    stride=spec.stride[0], padding=spec.padding[0],
                    pad_value=pad_value, epilogue="requant8",
                    net=pl.out_fl - cons.input_fl, out_signed=cons.input_symmetric,
                    impl="rows",
                )
                return IAct(y8, cons.input_fl, packed_for=pack_output_for)
            y = pallas_conv_int8(
                act.x, p["w"], b,
                stride=spec.stride[0], padding=spec.padding[0],
                pad_value=pad_value, epilogue="int32",
                impl="rows",
            )
            return IAct(y, pl.out_fl)

        is_1x1 = spec.kernel == (1, 1) and spec.stride == (1, 1) and spec.padding == (0, 0) and spec.groups == 1
        if self.int8_operands:
            if not pl.input_symmetric and self.border_bias and max(spec.padding) > 0:
                # Zero-point border-bias: with the unsigned repack s8 = u8-128
                # and TRUE-zero borders, acc_true = conv0pad(s8, w) +
                # 128 * (sum of w over the taps that land in-bounds at each
                # position).  That in-bounds weight sum is conv0pad(ones, w)
                # -- a batch-1 conv, 1/batch of the layer cost -- giving a
                # (1, H', W', O) bias map; the conv itself then uses XLA's
                # internal zero padding, eliminating the explicit -128 pad
                # (a full HBM round trip of the activation).  Bit-exact with
                # the pad path by construction.
                ones = jnp.ones((1,) + act.x.shape[1:], jnp.int8)
                bmap = p["b"] + 128 * self._dense0(ones, p["w"], spec, exact_f32)
                y = self._dense0(act.x, p["w"], spec, exact_f32) + bmap
                return self._emit(y, pl, name, pack_output_for)
            if not pl.input_symmetric:
                b = p.get("b_zp")
                if b is None:
                    b = p["b"] + 128 * jnp.sum(p["w"].astype(jnp.int32), axis=(0, 1, 2))
            else:
                b = p["b"]
            if is_1x1 and not exact_f32:
                # express 1x1 convs as dots; note the current XLA TPU
                # pipeline canonicalizes reshape+dot back into a convolution
                # (verified in optimized HLO), so this is today a no-op kept
                # for backends/pipelines where the s8 dot path survives
                n_, h_, w_, c_ = act.x.shape
                y2 = jnp.matmul(
                    act.x.reshape(n_ * h_ * w_, c_),
                    p["w"].reshape(c_, spec.out_ch),
                    preferred_element_type=jnp.int32,
                )
                y = y2.reshape(n_, h_, w_, spec.out_ch) + b
            elif pl.input_symmetric:
                y = self._dense0(act.x, p["w"], spec, exact_f32) + b
            else:
                y = _conv_int(
                    act.x, p["w"], spec, pad_value=-128, exact_f32=exact_f32
                ) + b
        else:
            y = _conv_int(act.x, p["w"].astype(jnp.int32), spec) + p["b"]
        return self._emit(y, pl, name, pack_output_for)

    def _bound(self, name):
        # bounds assume packed int8 operands (|x8| <= 128); the int32-operand
        # path feeds unpacked values up to 255, so it gets no bound (falls
        # back to the always-exact integer requant)
        if not self.int8_operands or not self.requant_bounds:
            return None
        return self.requant_bounds.get(name)

    def _emit(self, y, pl, name, pack_output_for):
        """Common conv output emission: fuse the requant+pack for a unique
        consumer, or materialize the boundary -- int32 accumulator
        (bit-exact contract) or bf16 real value (bf16_boundary mode)."""
        if pack_output_for is None and self.bf16_boundary:
            v = (
                y.astype(jnp.float32) * float(2.0 ** -pl.out_fl)
            ).astype(jnp.bfloat16)
            return IAct(v, pl.out_fl, scaled=True)
        out = IAct(y, pl.out_fl, abs_bound=self._bound(name))
        if pack_output_for is not None:
            out = self.pack_for(out, pack_output_for)
        return out

    def relu_i32(self, act: IAct) -> IAct:
        return IAct(
            jnp.maximum(act.x, 0), act.fl, abs_bound=act.abs_bound,
            scaled=act.scaled,
        )

    def add_int(self, res: IAct, x: IAct) -> IAct:
        """Left-shift the lower-fraclen operand onto the common grid, add,
        saturate to int32 (fix_resnet.py:40-76).  In bf16_boundary mode both
        operands are real values on aligned grids by construction: a plain
        bf16 add (the integize semantics at 2 B/elt)."""
        if res.scaled or x.scaled:
            assert res.scaled and x.scaled, "mixed boundary modes"
            return IAct(res.x + x.x, max(res.fl, x.fl), scaled=True)
        # int8-boundary mode: a packed 1-byte carry widens exactly back to
        # its int32 grid value before the aligned add
        if res.packed_for is not None:
            res = self._widen(res)
        if x.packed_for is not None:
            x = self._widen(x)
        r, rf, v, vf = res.x, res.fl, x.x, x.fl
        br, bv = res.abs_bound, x.abs_bound
        if rf >= vf:
            v = v << (rf - vf)
            out_fl = rf
            if bv is not None:
                bv = bv << (rf - vf)
        else:
            r = r << (vf - rf)
            out_fl = vf
            if br is not None:
                br = br << (vf - rf)
        ab = None if (br is None or bv is None) else min(br + bv, INT32_MAX)
        return IAct(jnp.clip(r + v, -INT32_MAX, INT32_MAX), out_fl, abs_bound=ab)

    def try_fused_ir(self, meta, a: IAct, next_consumer, pack_target):
        """Route an eligible inverted-residual block through the fused
        Pallas kernel (ops/pallas_ir_block.py): expand->dw->project (and the
        residual add) in one kernel, expanded activation VMEM-resident.
        Returns the block output IAct, or None when the block is ineligible
        (falls back to the per-layer path).  Bit-identical junction math:
        every requant is the same static-shift round-half-to-even the
        per-layer engine uses (or its provably-equal f32 form)."""
        if not self.fuse_ir or not self.int8_operands or self.use_pallas:
            return None
        if len(meta.body) != 3:
            return None
        en, dn, pn = meta.body
        se, sd, sp = self.graph[en], self.graph[dn], self.graph[pn]
        if not (se.kernel == (1, 1) and se.groups == 1 and se.stride == (1, 1)):
            return None
        if not (
            sd.is_depthwise
            and sd.kernel[0] == sd.kernel[1]
            and sd.padding[0] == sd.padding[1]
            # stride-1 only on hardware: Mosaic rejects strided vector
            # extracts (vector.extract_strided_slice strides must be 1), the
            # same limitation that keeps stride-2 depthwise off pallas_dw.
            # Stride-2 blocks fall back to the per-layer path.
            and sd.stride == (1, 1)
        ):
            return None
        if not (sp.kernel == (1, 1) and sp.groups == 1 and sp.stride == (1, 1)):
            return None

        from ..ops.pallas_ir_block import (
            fused_ir_block, per_row_bytes, pick_bn_tile,
        )

        ple, pld, plp = self.plan[en], self.plan[dn], self.plan[pn]
        if sd.out_ch > 768:
            # measured: the 7^2 Ce=960 block's scoped stack hits 18.3 MB at
            # 1568 rows (chunk-count-dependent temporaries the linear model
            # misses); the per-layer path keeps these small blocks
            return None
        ap = self.pack_for(a, en)
        n, h, wd_, cin = ap.x.shape
        ce = sd.out_ch
        pad_ = sd.padding[0]
        # window/scratch VMEM depends on the boundary mode: packed s8
        # carries and requant8/bf16 emissions shrink the lane-padded int32
        # windows that dominated the measured stack
        if meta.residual:
            carry_b = 1 if (self.int8_boundary and a.packed_for is not None) else (
                0 if a.scaled else 4
            )
        else:
            carry_b = 0
        if meta.residual:
            if a.scaled or self.bf16_boundary:
                out_b = 2
            elif self.int8_boundary and pack_target is not None:
                out_b = 1
            else:
                out_b = 4
        else:
            emits8 = next_consumer is not None or (
                self.int8_boundary and pack_target is not None
            )
            out_b = 1 if emits8 else (2 if self.bf16_boundary else 4)
        per_row = per_row_bytes(cin, ce, sp.out_ch, carry_b, out_b)
        bn = pick_bn_tile(n, h * wd_, per_row)
        if bn == 0:
            return None

        pe, pd, pp = self.params[en], self.params[dn], self.params[pn]

        def _bias(p, pl, spec):
            if pl.input_symmetric:
                return p["b"]
            bz = p.get("b_zp")
            if bz is None:
                bz = p["b"] + 128 * jnp.sum(p["w"].astype(jnp.int32), axis=(0, 1, 2))
            return bz

        w1 = pe["w"].reshape(cin, ce)
        wdw = pd["w"].reshape(sd.kernel[0], sd.kernel[1], ce)
        w2 = pp["w"].reshape(ce, sp.out_ch)
        common = dict(
            h=h, w=wd_, pad=pad_,
            net1=ple.out_fl - pld.input_fl, dw_in_signed=pld.input_symmetric,
            net2=pld.out_fl - plp.input_fl, proj_in_signed=plp.input_symmetric,
            bn_tile=bn,
        )
        kw = dict(common)
        b1 = _bias(pe, ple, se)
        bdw = pd["b"]  # dw math runs on UNPACKED grid values: plain bias
        b2 = _bias(pp, plp, sp)

        if meta.residual:
            if a.scaled:
                # bf16-boundary carry: kernel emits the projected real value,
                # the bf16 add stays outside (add_int scaled+scaled)
                y = fused_ir_block(
                    ap.x, w1, b1, wdw, bdw, w2, b2,
                    out="bf16", out_fl=plp.out_fl, **kw,
                )
                out = self.add_int(IAct(y, plp.out_fl, scaled=True), a)
                return out
            if a.packed_for is not None:
                # keep the 1-byte carry packed on the wire; the kernel
                # widens in-register (engine _widen semantics)
                cpl = self.plan[a.packed_for]
                carry_x = a.x
                carry_fl = cpl.input_fl
                carry_off = 0 if cpl.input_symmetric else 128
                bv = 256
            else:
                carry_x, carry_fl, carry_off = a.x, a.fl, 0
                bv = a.abs_bound
            rf, vf = plp.out_fl, carry_fl
            shift_res, shift_carry = max(vf - rf, 0), max(rf - vf, 0)
            out_fl = max(rf, vf)
            br = self._bound(pn)
            ab = (
                None if (br is None or bv is None)
                else min((br << shift_res) + (bv << shift_carry), INT32_MAX)
            )
            if self.int8_boundary and pack_target is not None:
                tgt = self.plan[pack_target]
                y8 = fused_ir_block(
                    ap.x, w1, b1, wdw, bdw, w2, b2, carry_x,
                    out="requant8", net_out=out_fl - tgt.input_fl,
                    out_signed=tgt.input_symmetric,
                    shift_res=shift_res, shift_carry=shift_carry,
                    carry_add_offset=carry_off, **kw,
                )
                return IAct(y8, tgt.input_fl, packed_for=pack_target)
            y = fused_ir_block(
                ap.x, w1, b1, wdw, bdw, w2, b2, carry_x,
                out="int32", shift_res=shift_res, shift_carry=shift_carry,
                carry_add_offset=carry_off, **kw,
            )
            if self.bf16_boundary:
                # relaxed boundary of the ADD output (engine add_int keeps
                # int32 only in strict/int8b modes; in bf16 mode the carry
                # was scaled and handled above)
                raise AssertionError("unreachable: bf16 carries are scaled")
            return IAct(y, out_fl, abs_bound=ab)

        # non-residual block
        if self.int8_boundary and next_consumer is None and pack_target is not None:
            tgt = self.plan[pack_target]
            y8 = fused_ir_block(
                ap.x, w1, b1, wdw, bdw, w2, b2,
                out="requant8", net_out=plp.out_fl - tgt.input_fl,
                out_signed=tgt.input_symmetric, **kw,
            )
            return IAct(y8, tgt.input_fl, packed_for=pack_target)
        if next_consumer is not None:
            cons = self.plan[next_consumer]
            y8 = fused_ir_block(
                ap.x, w1, b1, wdw, bdw, w2, b2,
                out="requant8", net_out=plp.out_fl - cons.input_fl,
                out_signed=cons.input_symmetric, **kw,
            )
            return IAct(y8, cons.input_fl, packed_for=next_consumer)
        if self.bf16_boundary:
            y = fused_ir_block(
                ap.x, w1, b1, wdw, bdw, w2, b2,
                out="bf16", out_fl=plp.out_fl, **kw,
            )
            return IAct(y, plp.out_fl, scaled=True)
        y = fused_ir_block(ap.x, w1, b1, wdw, bdw, w2, b2, out="int32", **kw)
        return IAct(y, plp.out_fl, abs_bound=self._bound(pn))

    # -- float-simulation path ---------------------------------------------

    def conv_sim(self, name, x):
        """Quantize the real-valued input to the 8-bit grid, conv with
        integer-valued float weights, rescale back (fix_resnet.py:78-90)."""
        pl = self.plan[name]
        spec = self.graph[name]
        q, _ = fix_quant(x, 8, float(pl.input_fl), x.ndim - 1, pl.input_symmetric)
        xi = jnp.round(q * 2.0**pl.input_fl)
        w = self.params[name]["w"].astype(jnp.float32)
        y = _conv_float(xi, w, spec) + self.params[name]["b"].astype(jnp.float32)
        y = jnp.clip(y, -float(INT32_MAX), float(INT32_MAX))
        return y / 2.0**pl.out_fl

    def add_sim(self, res, res_fl, x, x_fl):
        out_fl = max(res_fl, x_fl)
        scale = 2.0**out_fl
        s = jnp.clip(res * scale + x * scale, -float(INT32_MAX), float(INT32_MAX))
        return s / scale, out_fl


def _block_resnet_int(w: _Walker, meta, a: IAct, pack_target=None) -> IAct:
    """Basic/Bottleneck integer block.  Intra-body edges fuse the output
    requant (unique consumer); the last body conv and the shortcut stay int32
    for the saturating add; the intervening ReLUs are absorbed by the
    unsigned requant clamps (fix_resnet.py:26-77).

    int8-boundary mode (`pack_target` = the next block's first conv): the
    incoming carry `a` is a 1-byte packed tensor (add_int widens it; the
    shortcut conv repacks it if grids differ) and the post-ReLU add output
    requantizes ONCE onto pack_target's QAT input grid, so the block
    boundary crosses HBM at 1 B/elt."""
    v = a
    for prev, nxt in zip(meta.body[:-1], meta.body[1:]):
        v = w.conv_int(prev, v, pack_output_for=nxt)
    res = w.conv_int(meta.body[-1], v)
    s = a if meta.shortcut is None else w.conv_int(meta.shortcut, a)
    out = w.relu_i32(w.add_int(res, s))
    if w.int8_boundary and pack_target is not None:
        return w.pack_for(out, pack_target)
    return out


def _block_resnet_sim(w: _Walker, meta, x, fl):
    x_in, fl_in = x, fl
    for i, cname in enumerate(meta.body):
        if i > 0:
            x = jnp.maximum(x, 0.0)
        x = w.conv_sim(cname, x)
    fl = w.plan[meta.body[-1]].out_fl
    if meta.shortcut is None:
        s, s_fl = x_in, fl_in
    else:
        s = w.conv_sim(meta.shortcut, x_in)
        s_fl = w.plan[meta.shortcut].out_fl
    x, fl = w.add_sim(x, fl, s, s_fl)
    return jnp.maximum(x, 0.0), fl


def _block_mbv1_int(w: _Walker, meta, a: IAct, next_consumer) -> IAct:
    """Depthwise-separable block: straight chain, everything fuses.  The
    trailing ReLU (fix_mobilenet_v1.py:85-91) is absorbed by the next
    block's unsigned requant; the final block keeps int32 + explicit ReLU
    for the average pool."""
    a = w.conv_int(meta.body[0], a, pack_output_for=meta.body[1])
    if next_consumer is not None:
        return w.conv_int(meta.body[1], a, pack_output_for=next_consumer)
    return w.relu_i32(w.conv_int(meta.body[1], a))


def _block_mbv1_sim(w: _Walker, meta, x, fl):
    for i, cname in enumerate(meta.body):
        if i > 0:
            x = jnp.maximum(x, 0.0)
        x = w.conv_sim(cname, x)
    fl = w.plan[meta.body[-1]].out_fl
    return jnp.maximum(x, 0.0), fl


def _block_mbv2_int(w: _Walker, meta, a: IAct, next_consumer, pack_target=None) -> IAct:
    """Inverted residual: body edges fuse; residual blocks keep int32 ends
    for the aligned add; no post-add ReLU (fix_mobilenet_v2.py:20-48).

    int8-boundary mode (`pack_target` = the next block's first conv, or the
    tail): every block output -- including the residual carries the strict
    contract keeps int32 -- requantizes onto pack_target's QAT grid and
    crosses HBM at 1 B/elt; the next add widens the packed carry."""
    fused = w.try_fused_ir(meta, a, next_consumer, pack_target)
    if fused is not None:
        return fused
    v = a
    for prev, nxt in zip(meta.body[:-1], meta.body[1:]):
        v = w.conv_int(prev, v, pack_output_for=nxt)
    if meta.residual:
        res = w.conv_int(meta.body[-1], v)
        out = w.add_int(res, a)
        if w.int8_boundary and pack_target is not None:
            out = w.pack_for(out, pack_target)
        return out
    if w.int8_boundary and next_consumer is None and pack_target is not None:
        # next block is residual: this output is its carry -- pack it onto
        # the next conv's grid instead of carrying int32
        return w.conv_int(meta.body[-1], v, pack_output_for=pack_target)
    return w.conv_int(meta.body[-1], v, pack_output_for=next_consumer)


def _block_mbv2_sim(w: _Walker, meta, x, fl):
    x_in, fl_in = x, fl
    for i, cname in enumerate(meta.body):
        if i > 0:
            x = jnp.maximum(x, 0.0)
        x = w.conv_sim(cname, x)
    fl = w.plan[meta.body[-1]].out_fl
    if meta.residual:
        x, fl = w.add_sim(x, fl, x_in, fl_in)
    return x, fl


def _classifier_int(w: _Walker, a: IAct):
    pl = w.plan["classifier"]
    p = w.params["classifier"]
    if a.packed_for is None:
        a = w.pack_for(a, "classifier")
    else:
        assert a.packed_for == "classifier"
    if w.int8_operands:
        if pl.input_symmetric:
            b = p.get("b")
        else:
            comp = 128 * jnp.sum(p["w"].astype(jnp.int32), axis=0)
            b = p.get("b_zp", p.get("b", 0) + comp)
        y = jnp.matmul(a.x, p["w"], preferred_element_type=jnp.int32)
    else:
        y = jnp.matmul(
            a.x.astype(jnp.int32), p["w"].astype(jnp.int32),
            preferred_element_type=jnp.int32,
        )
        b = p.get("b")
    if b is not None:
        y = y + b
    return y.astype(jnp.float32)


def _classifier_sim(w: _Walker, x):
    pl = w.plan["classifier"]
    q, _ = fix_quant(x, 8, float(pl.input_fl), 1, pl.input_symmetric)
    xi = jnp.round(q * 2.0**pl.input_fl)
    y = xi @ w.params["classifier"]["w"].astype(jnp.float32)
    if "b" in w.params["classifier"]:
        y = y + w.params["classifier"]["b"].astype(jnp.float32)
    # like the reference's integize mode, logits stay on the 2^out_fl integer
    # grid (IntModel.forward applies no final rescale) -- argmax-invariant
    return jnp.clip(y, -float(INT32_MAX), float(INT32_MAX))


def int_forward(
    model, plan, int_params, x, cfg=None,
    int8_operands: bool = True, use_pallas: bool = False, f32_taps: int = 0,
    border_bias: bool = False, maxpool_impl: str = "single",
    stem_kernel: bool = False, stem_s2d: bool = False, stem_impl: str = "v2",
    dw_int: bool = False, dw_taps: bool = False, mxu_bf16: str = "",
    bf16_boundary: bool = False, int8_boundary: bool = False,
    fuse_ir: bool = False,
    requant_bounds=None, requant_log=None,
):
    """Integer-only forward.  `x` is the conditioned uint8-range input:
    round(255*image) as int32 (unnormalized pipeline, fraclen 8), or the
    head-quantized int for the normalized pipeline (fix_train.py:676-694)."""
    return _forward(
        model, plan, int_params, x, cfg,
        int_only=True, int8_operands=int8_operands, use_pallas=use_pallas,
        f32_taps=f32_taps, border_bias=border_bias, maxpool_impl=maxpool_impl,
        stem_kernel=stem_kernel, stem_s2d=stem_s2d, stem_impl=stem_impl,
        dw_int=dw_int, dw_taps=dw_taps, mxu_bf16=mxu_bf16,
        bf16_boundary=bf16_boundary, int8_boundary=int8_boundary,
        fuse_ir=fuse_ir,
        requant_bounds=requant_bounds,
        requant_log=requant_log,
    )


def float_sim_forward(model, plan, int_params, x, cfg=None):
    """Float-dtype simulation of the integer graph ('integize' mode)."""
    return _forward(model, plan, int_params, x, cfg, int_only=False)


def add_zero_point_bias(model, plan, int_params):
    """Pre-fold the unsigned-activation compensation 128*colsum(w) into a
    'b_zp' entry for every layer with an unsigned (single-side) input."""
    from ..nn.spec import LinearSpec

    out = {}
    for name, entry in int_params.items():
        e = dict(entry)
        pl = plan[name]
        if not pl.input_symmetric:
            axes = (0,) if isinstance(model.graph[name], LinearSpec) else (0, 1, 2)
            comp = 128 * jnp.sum(entry["w"].astype(jnp.int32), axis=axes)
            e["b_zp"] = entry.get("b", 0) + comp
        out[name] = e
    return out


def compute_requant_bounds(model, plan, int_params):
    """Static per-layer bound on |conv(x8, w) + bias|: 128 * sum|w| plus the
    actually-used bias magnitude, maxed over output channels -- an exact
    worst case over all int8 operands (|x8| <= 128 after the zero-point
    repack).  Computed from CONCRETE baked params outside jit; the Python
    ints become trace-time constants licensing the f32 requant epilogue."""
    import numpy as np

    from ..nn.spec import ConvBNSpec

    bounds = {}
    for name, entry in int_params.items():
        spec = model.graph[name]
        if not isinstance(spec, ConvBNSpec):
            continue
        w = np.abs(np.asarray(entry["w"], np.int64))
        col = 128 * w.sum(axis=tuple(range(w.ndim - 1)))
        b = np.zeros_like(col)
        if "b_zp" in entry:
            b = np.maximum(b, np.abs(np.asarray(entry["b_zp"], np.int64)))
        if "b" in entry:
            b = np.maximum(b, np.abs(np.asarray(entry["b"], np.int64)))
        bounds[name] = int((col + b).max())
    return bounds


def _forward(
    model, plan, int_params, x, cfg, int_only: bool,
    int8_operands: bool = True, use_pallas: bool = False, f32_taps: int = 0,
    border_bias: bool = False, maxpool_impl: str = "single",
    stem_kernel: bool = False, stem_s2d: bool = False, stem_impl: str = "v2",
    dw_int: bool = False, dw_taps: bool = False, mxu_bf16: str = "",
    bf16_boundary: bool = False, int8_boundary: bool = False,
    fuse_ir: bool = False,
    requant_bounds=None, requant_log=None,
):
    cfg = cfg or model.cfg
    w = _Walker(
        model, plan, int_params, cfg, int_only, int8_operands, use_pallas,
        f32_taps, border_bias, stem_s2d=stem_s2d, dw_int=dw_int,
        dw_taps=dw_taps, mxu_bf16=mxu_bf16, bf16_boundary=bf16_boundary,
        int8_boundary=int8_boundary, fuse_ir=fuse_ir,
        requant_bounds=requant_bounds, requant_log=requant_log,
    )
    fam = model.name
    head_pl = plan["head"]

    if int_only:
        # conditioned wire input: <=255 unsigned / <=128 signed
        a = IAct(x.astype(jnp.int32), head_pl.input_fl, abs_bound=256)
        if fam.startswith("resnet"):
            # head output feeds maxpool whose output has two consumers
            # (first conv + residual identity): stays int32
            hspec = model.graph["head"]
            if (
                stem_kernel
                and int8_operands
                and hspec.kernel == (7, 7)
                and hspec.stride == (2, 2)
                and hspec.padding == (3, 3)
                and hspec.in_ch == 3
                and hspec.groups == 1
                and x.shape[1] % 8 == 0
                and x.shape[1] == x.shape[2]
            ):
                # fused Pallas stem: conv+bias+relu+maxpool in one pass,
                # writing only the pooled int32 activation
                # (ops/pallas_stem.py); mirror pack_for's wire requant.
                # v2 (default) pre-expands the x-taps into lane-aligned
                # bands so the kernel needs no narrow scratch stores (v1
                # measured 0.24x at model level); stem_impl='v1' keeps the
                # original for A/B (an explicit argument, so each setting
                # gets its own trace — env vars read at trace time are not
                # part of the jit cache key).
                from ..ops import pallas_stem as _ps

                v = shift_requant(
                    x.astype(jnp.int32), 8, head_pl.input_fl, a.fl,
                    head_pl.input_symmetric,
                )
                zp = 0 if head_pl.input_symmetric else 128
                v8 = (v - zp).astype(jnp.int8)
                if stem_impl == "v2":
                    be, bo, w256, comp = _ps.build_stem_inputs_v2(
                        v8, int_params["head"]["w"], conv_h=x.shape[1] // 2,
                        zero_point=zp,
                    )
                    pooled = _ps.stem_pool_int8_v2(
                        be, bo, w256, int_params["head"]["b"] + comp,
                        conv_h=x.shape[1] // 2, valid_w=x.shape[1] // 4,
                    )
                else:
                    be, bo, w192, comp = _ps.build_stem_inputs(
                        v8, int_params["head"]["w"], conv_h=x.shape[1] // 2,
                        zero_point=zp,
                    )
                    pooled = _ps.stem_pool_int8(
                        be, bo, w192, int_params["head"]["b"] + comp,
                        conv_h=x.shape[1] // 2, valid_w=x.shape[1] // 4,
                    )
                # relu+maxpool preserve the head's static |acc+bias| bound
                a = IAct(pooled, head_pl.out_fl, abs_bound=w._bound("head"))
            else:
                a = w.relu_i32(w.conv_int("head", a))
                if w.int8_boundary:
                    # pack the stem activation (the zoo's largest tensor)
                    # BEFORE the pool: max commutes with the monotone
                    # s8 = u8 - 128 map, so the int8 maxpool reads/writes
                    # 1 B/elt instead of the contract's 4
                    a = w.pack_for(a, model.blocks[0].body[0])
                    a = IAct(
                        _maxpool(a.x, 3, 2, 1, impl=maxpool_impl), a.fl,
                        packed_for=a.packed_for,
                    )
                else:
                    # max commutes with the monotone scale, so the
                    # bf16-boundary pool is the same pooled value at 2 B/elt
                    a = IAct(
                        _maxpool(a.x, 3, 2, 1, impl=maxpool_impl), a.fl,
                        abs_bound=a.abs_bound, scaled=a.scaled,
                    )
            # int8-boundary carries requantize onto the NEXT block's first
            # conv grid; the final block stays int32 for the average pool
            ptargets = [m.body[0] for m in model.blocks[1:]] + [None]
            for meta, pt in zip(model.blocks, ptargets):
                a = _block_resnet_int(w, meta, a, pack_target=pt)
        elif fam == "mobilenet_v1":
            consumers = [m.body[0] for m in model.blocks[1:]] + [None]
            a = w.conv_int("head", a, pack_output_for=model.blocks[0].body[0])
            for meta, nxt in zip(model.blocks, consumers):
                a = _block_mbv1_int(w, meta, a, nxt)
        else:  # mobilenet_v2
            consumers = []
            for k in range(1, len(model.blocks)):
                nxt = model.blocks[k]
                consumers.append(None if nxt.residual else nxt.body[0])
            consumers.append("tail")
            first = model.blocks[0]
            a = w.conv_int(
                "head", a,
                pack_output_for=None if first.residual else first.body[0],
            )
            ptargets = [m.body[0] for m in model.blocks[1:]] + ["tail"]
            for meta, nxt, pt in zip(model.blocks, consumers, ptargets):
                a = _block_mbv2_int(w, meta, a, nxt, pack_target=pt)
            a = w.relu_i32(w.conv_int("tail", a))

        # global average pool (shift derived from the built pool extent,
        # fix_quant_ops.py:117-124)
        if cfg.quant_avgpool:
            shift = avgpool_shift_for(getattr(model, "pool_kernel", 7))
            if a.scaled:
                # sum in f32 (a bf16 49-term sum would round), same
                # extent-derived shift as the integer path
                pooled = (
                    jnp.sum(a.x.astype(jnp.float32), (1, 2))
                    * float(2.0**-shift)
                ).astype(jnp.bfloat16)
                a = IAct(pooled, a.fl + shift, scaled=True)
            else:
                # the H*W-element sum multiplies the static bound by the pool
                # extent (trace-time shape), keeping the classifier-input
                # requant eligible for the f32 form; requant_f32_eligible
                # itself rejects any bound too large to be meaningful
                ab = (
                    None
                    if a.abs_bound is None
                    else a.abs_bound * a.x.shape[1] * a.x.shape[2]
                )
                a = IAct(jnp.sum(a.x, (1, 2)), a.fl + shift, abs_bound=ab)
        else:
            # reference falls back to float mean on this path
            # (fix_resnet.py:375-382)
            m = jnp.mean(a.x.astype(jnp.float32), (1, 2))
            if not a.scaled:
                m = m / 2.0**a.fl
            pl = plan["classifier"]
            q, _ = fix_quant(m, 8, float(pl.input_fl), 1, pl.input_symmetric)
            a = IAct(jnp.round(q * 2.0**pl.input_fl).astype(jnp.int32), pl.input_fl)
        return _classifier_int(w, a)

    # ---- float-dtype integer simulation ('integize') ----
    if cfg.normalize:
        q, _ = fix_quant(x, 8, float(head_pl.input_fl), 3, head_pl.input_symmetric)
        xi = jnp.round(q * 2.0**head_pl.input_fl)
    else:
        xi = jnp.round(x * 2.0**head_pl.input_fl)
    hw = int_params["head"]["w"].astype(jnp.float32)
    hx = _conv_float(xi, hw, model.graph["head"]) + int_params["head"]["b"].astype(
        jnp.float32
    )
    hx = jnp.clip(hx, -float(INT32_MAX), float(INT32_MAX))
    hx = hx / 2.0**head_pl.out_fl
    fl = head_pl.out_fl
    hx = jnp.maximum(hx, 0.0)
    if fam.startswith("resnet"):
        hx = _maxpool(hx, 3, 2, 1)
        block_fn = _block_resnet_sim
    elif fam == "mobilenet_v1":
        block_fn = _block_mbv1_sim
    else:
        block_fn = _block_mbv2_sim

    for meta in model.blocks:
        hx, fl = block_fn(w, meta, hx, fl)

    if fam == "mobilenet_v2":
        hx = w.conv_sim("tail", hx)
        fl = plan["tail"].out_fl
        hx = jnp.maximum(hx, 0.0)

    if cfg.quant_avgpool:
        hx = jnp.sum(hx, (1, 2)) / 2.0 ** avgpool_shift_for(
            getattr(model, "pool_kernel", 7)
        )
    else:
        hx = jnp.mean(hx, (1, 2))
    return _classifier_sim(w, hx)


class IntEngine:
    """Jitted integer inference engine bound to a baked plan."""

    def __init__(
        self,
        model,
        plan,
        int_params,
        cfg=None,
        int_only: bool = True,
        int8_operands: bool = True,
        use_pallas: bool = False,
        f32_taps: int = 0,
        border_bias: bool = False,
        maxpool_impl: str = "single",
        stem_kernel: bool = False,
        stem_s2d: bool = False,
        stem_impl: Optional[str] = None,
        pad_channels_to: int = 0,
        dw_int: bool = False,
        dw_taps: bool = False,
        f32_requant: bool = True,
        mxu_bf16: str = "",
        bf16_boundary: bool = False,
        int8_boundary: bool = False,
        fuse_ir: bool = False,
    ):
        if bf16_boundary or int8_boundary:
            # the relaxed-boundary modes compose with the default engine
            # only: they share the fused int8 chains but not the alternative
            # stem/pallas materialization paths
            assert int_only and int8_operands and not use_pallas and not stem_kernel, (
                "boundary modes require the default int8 XLA engine"
            )
            assert not (bf16_boundary and int8_boundary)
        if stem_impl is None:
            # read once at construction so post-compile env flips can't
            # silently keep a stale impl (the jit cache key carries it)
            stem_impl = os.environ.get("F8NET_STEM_IMPL", "v2")
        if int_only and pad_channels_to:
            # lane-align narrow channels with zero weights at bake time --
            # bit-exact by construction (quant/pad_channels.py); engine-only:
            # the padded graph matches int_params, not the float params
            from ..quant.pad_channels import pad_channels

            model, int_params = pad_channels(
                model, int_params,
                multiple=pad_channels_to, threshold=pad_channels_to,
            )
        self.model = model
        self.plan = plan
        self.cfg = cfg or model.cfg
        self.int_only = int_only
        self.int8_operands = int8_operands
        self.use_pallas = use_pallas
        if int_only and int8_operands:
            int_params = add_zero_point_bias(model, plan, int_params)
        self.int_params = int_params
        requant_bounds = (
            compute_requant_bounds(model, plan, int_params)
            if (int_only and f32_requant)
            else None
        )
        self._fwd_kwargs = dict(
            int8_operands=int8_operands, use_pallas=use_pallas,
            f32_taps=f32_taps, border_bias=border_bias,
            maxpool_impl=maxpool_impl, stem_kernel=stem_kernel,
            stem_s2d=stem_s2d, stem_impl=stem_impl, dw_int=dw_int,
            dw_taps=dw_taps, mxu_bf16=mxu_bf16, bf16_boundary=bf16_boundary,
            int8_boundary=int8_boundary, fuse_ir=fuse_ir,
            requant_bounds=requant_bounds,
        )
        if int_only:
            self._jit = jax.jit(
                lambda p, xx: int_forward(
                    self.model, self.plan, p, xx, self.cfg, **self._fwd_kwargs
                )
            )
        else:
            self._jit = jax.jit(
                lambda p, xx: float_sim_forward(self.model, self.plan, p, xx, self.cfg)
            )

    def __call__(self, x):
        return self._jit(self.int_params, x)

    def audit_requant_forms(self, x):
        """Which execution form does each requant take, and why.

        Requant decisions are trace-time static (the bound, the fraclens and
        the eligibility rule are all Python ints), so ONE abstract trace
        (jax.eval_shape -- no compile, no device) captures every decision the
        jitted engine will bake in.  Returns [(consumer_layer, 'f32'|'int',
        abs_bound_or_None)] in execution order; `x` is a conditioned input
        (condition_input output) or anything of the same shape/dtype."""
        if not self.int_only:
            raise ValueError("audit_requant_forms: integer engine only")
        log = []
        jax.eval_shape(
            lambda p, xx: int_forward(
                self.model, self.plan, p, xx, self.cfg,
                requant_log=log, **self._fwd_kwargs,
            ),
            self.int_params, x,
        )
        return log

    def condition_input(self, images):
        """Reference input conditioning (fix_train.py:676-694): images in
        [0,1] NHWC float -> engine input."""
        head_pl = self.plan["head"]
        if self.int_only:
            # narrow wire dtypes: the engine casts to int32 on device, and
            # host->device transfer (the serving bottleneck behind thin
            # links) shrinks 4x vs int32
            if self.cfg.normalize:
                q, _ = fix_quant(
                    images, 8, float(head_pl.input_fl), 3, head_pl.input_symmetric
                )
                return jnp.round(q * 2.0**head_pl.input_fl).astype(jnp.int8)
            return jnp.round(255.0 * images).astype(jnp.uint8)
        if self.cfg.normalize:
            return images  # fix_quant applied inside the forward
        return jnp.round(255.0 * images) / 256.0  # fix_train.py:694 conditioning
