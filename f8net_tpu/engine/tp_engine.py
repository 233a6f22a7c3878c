"""Explicit tensor-parallel integer engine: the Megatron pairing at model
level (shard_map over Mesh('data','model')).

The GSPMD TP route (parallel/mesh.py) shards conv out-channels and lets XLA
insert an all-gather after every sharded layer.  This engine assigns each
layer an explicit parallel mode so collectives collapse to one or two int32
`psum`s per block and ZERO all-gathers (HLO-asserted in
tests/test_tp_engine.py):

  col    out-channels sharded; input full; output stays sharded
  shard  depthwise: channelwise on the sharded activations, free
  row    in-channels sharded (matching the producer's out-shard, or sliced
         locally from a full input); partial products + zero-point
         compensation are summed with one `psum`, then bias + requant
  rep    replicated (the C=3 ResNet stem + maxpool)

Family assignments (tp_modes): MobileNetV2 expand->dw->project == col->
shard->row (one psum per block; the tail runs col so even the classifier
psum is the only end collective).  MobileNetV1 dw->pw == shard->row.
ResNet body[0] col, remaining body + shortcut row (partials of the residual
pair share the block's psums).  Bit-exactness: int32 addition is
associative and wraparound (mod 2^32) distributes over partial sums, the
saturating clip runs only on the psum'd total, and every requant shift is
a static int -- so the sharded engine is BIT-EQUAL to engine/int_engine.py
(triangulated in tests/test_tp_engine.py on the virtual 8-device mesh).

Reference: this replaces the reference's NCCL data-parallel-only story
(myutils/distributed.py) with the TPU scaling-book collective design; no
reference counterpart exists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..nn.spec import LinearSpec
from ..ops.fxp import (
    F32_EXACT_BOUND, fix_quant, requant_f32_eligible, shift_requant,
    shift_requant_f32,
)
from .int_engine import INT32_MAX, _maxpool, avgpool_shift_for


def tp_modes(model) -> dict:
    """Layer name -> parallel mode for the Megatron pairing."""
    fam = model.name
    modes = {}
    if fam.startswith("resnet"):
        modes["head"] = "rep"
        for meta in model.blocks:
            modes[meta.body[0]] = "col"
            for nm in meta.body[1:]:
                modes[nm] = "row"
            if meta.shortcut is not None:
                modes[meta.shortcut] = "row"
    elif fam == "mobilenet_v1":
        modes["head"] = "col"
        for meta in model.blocks:
            modes[meta.body[0]] = "shard"  # depthwise
            modes[meta.body[1]] = "row"
    else:  # mobilenet_v2
        modes["head"] = "col"
        for meta in model.blocks:
            if len(meta.body) == 3:
                modes[meta.body[0]] = "col"
                modes[meta.body[1]] = "shard"
                modes[meta.body[2]] = "row"
            else:  # t=1 first block: dw -> pw
                # no MBv2 t=1 block is residual (32->16); keep the untested
                # combination loud rather than silently accepted
                assert not meta.residual, meta
                modes[meta.body[0]] = "shard"
                modes[meta.body[1]] = "row"
        modes["tail"] = "col"
    modes["classifier"] = "row"
    return modes


def tp_param_specs(model, modes, axis: str = "model") -> dict:
    """PartitionSpec pytree for int_params under the mode assignment."""
    specs = {}
    for name in model.graph.names():
        entry = model.graph[name]
        mode = modes[name]
        if isinstance(entry, LinearSpec):
            w = P(axis, None) if mode == "row" else P(None, axis)
        elif mode in ("col", "shard"):
            w = P(None, None, None, axis)  # HWIO out-channels (dw: O == C)
        elif mode == "row":
            w = P(None, None, axis, None)  # HWIO in-channels
        else:
            w = P()
        b = P(axis) if mode in ("col", "shard") else P()
        specs[name] = {"w": w, "b": b}
    return specs


def _conv(x, w, stride, padding, groups, pad_value, exact_f32=False):
    if pad_value != 0 and max(padding) > 0:
        x = jnp.pad(
            x,
            [(0, 0), (padding[0],) * 2, (padding[1],) * 2, (0, 0)],
            constant_values=x.dtype.type(pad_value),
        )
        pads = [(0, 0), (0, 0)]
    else:
        pads = [(padding[0],) * 2, (padding[1],) * 2]
    if exact_f32:
        # bf16 operands + f32 accumulation on the MXU (int_engine._conv_int
        # exact_f32): bit-exact under the caller's static bound gate.  For a
        # ROW-mode K-shard the partial is bounded by 128*sum_subset|w| <=
        # the full-layer bound, so each device's partial is f32-exact and
        # the int32 psum of exact partials equals the single-device total.
        y = lax.conv_general_dilated(
            x.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            window_strides=stride,
            padding=pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32,
        )
        return y.astype(jnp.int32)
    return lax.conv_general_dilated(
        x.astype(jnp.int32),
        w.astype(jnp.int32),
        window_strides=stride,
        padding=pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )


class _TAct:
    __slots__ = ("x", "fl", "packed_for", "sharded", "abs_bound", "scaled")

    def __init__(
        self, x, fl, packed_for=None, sharded=False, abs_bound=None,
        scaled=False,
    ):
        self.x = x
        self.fl = fl
        self.packed_for = packed_for
        self.sharded = sharded
        # static |value| proof for the f32 requant fast path (int_engine.IAct)
        self.abs_bound = abs_bound
        # relaxed-boundary mode (int_engine.IAct.scaled): `x` is the REAL
        # value acc*2^-fl as bf16 instead of the int32 accumulator
        self.scaled = scaled


class _TPWalker:
    """Local (per-device) view of the integer graph walk.  Runs inside
    shard_map: params arrive pre-sliced by tp_param_specs, activations are
    tracked as full (replicated over the model axis) or sharded."""

    def __init__(
        self, model, plan, local_params, cfg, modes, axis, nshard,
        requant_bounds=None, mxu_bf16: str = "", bf16_boundary: bool = False,
        int8_boundary: bool = False,
    ):
        self.model = model
        self.graph = model.graph
        self.plan = plan
        self.params = local_params
        self.cfg = cfg
        self.modes = modes
        self.axis = axis
        self.nshard = nshard
        # {layer: static |acc+bias| bound} licensing the bit-exact f32
        # requant (computed from FULL baked params; valid for any shard: a
        # row-mode requant runs on the post-psum total == the single-device
        # accumulator, a col/shard-mode one on a channel subset of it)
        self.requant_bounds = requant_bounds or {}
        # bf16-operand MXU convs for bound-eligible dense convs (the
        # int_engine mxu_bf16 policy: '' | '1x1' | 'eligible')
        self.mxu_bf16 = mxu_bf16
        # relaxed-boundary throughput mode (int_engine._Walker.bf16_boundary):
        # multi-consumer boundaries materialize as bf16 real values; fused
        # int8 chains are identical to the bit-exact engine.  For row-mode
        # layers the int32 psum runs BEFORE the bf16 conversion, so the
        # boundary value equals the single-device engine's bit-for-bit.
        self.bf16_boundary = bf16_boundary
        # 1-byte boundary mode (int_engine._Walker.int8_boundary): carries
        # requantize once onto the next conv's QAT grid; residual adds widen
        # the packed carry.  All conversions run on post-psum totals, so the
        # TP mode is bit-equal to the single-device int8-boundary engine.
        self.int8_boundary = int8_boundary
        assert not (bf16_boundary and int8_boundary)

    def _widen(self, act: _TAct) -> _TAct:
        """Packed int8 operand -> its int32 grid value (int_engine._widen)."""
        assert act.packed_for is not None
        pl = self.plan[act.packed_for]
        v = act.x.astype(jnp.int32)
        if not pl.input_symmetric:
            v = v + 128
        return _TAct(v, pl.input_fl, sharded=act.sharded, abs_bound=256)

    def pack_for(self, act: _TAct, name: str) -> _TAct:
        if act.packed_for is not None:
            if act.packed_for == name:
                return act
            # int8-boundary mode: one packed carry may feed several convs
            assert self.int8_boundary, (act.packed_for, name)
            src = self.plan[act.packed_for]
            pl = self.plan[name]
            if (src.input_fl, src.input_symmetric) == (
                pl.input_fl, pl.input_symmetric
            ):
                return _TAct(
                    act.x, act.fl, packed_for=name, sharded=act.sharded
                )
            return self.pack_for(self._widen(act), name)
        pl = self.plan[name]
        if act.scaled:
            # quantize the bf16 real value straight onto the consumer's
            # 8-bit grid (round-half-even + clamp, as int_engine.pack_for)
            v = jnp.round(act.x.astype(jnp.float32) * float(2.0**pl.input_fl))
            if pl.input_symmetric:
                v8 = jnp.clip(v, -127, 127).astype(jnp.int8)
            else:
                v8 = (jnp.clip(v, 0, 255) - 128).astype(jnp.int8)
            return _TAct(v8, pl.input_fl, packed_for=name, sharded=act.sharded)
        rq = shift_requant
        if (
            act.abs_bound is not None
            and requant_f32_eligible(
                act.abs_bound, pl.input_fl, act.fl, 8, pl.input_symmetric
            )
        ):
            rq = shift_requant_f32
        v = rq(act.x, 8, pl.input_fl, act.fl, pl.input_symmetric)
        v8 = (v if pl.input_symmetric else v - 128).astype(jnp.int8)
        return _TAct(v8, pl.input_fl, packed_for=name, sharded=act.sharded)

    def _in_slice(self, x, csh):
        idx = lax.axis_index(self.axis)
        return lax.dynamic_slice_in_dim(x, idx * csh, csh, axis=x.ndim - 1)

    def conv_int(self, name: str, act: _TAct, pack_output_for=None) -> _TAct:
        pl = self.plan[name]
        spec = self.graph[name]
        mode = self.modes[name]
        act = self.pack_for(act, name)
        p = self.params[name]
        w = p["w"]
        pad_value = 0 if pl.input_symmetric else -128

        if mode in ("rep", "col"):
            assert not act.sharded, name
            x = act.x
            groups = spec.groups
        elif mode == "shard":
            assert spec.is_depthwise
            csh = spec.in_ch // self.nshard
            x = act.x if act.sharded else self._in_slice(act.x, csh)
            groups = csh
        else:  # row
            csh = spec.in_ch // self.nshard
            x = act.x if act.sharded else self._in_slice(act.x, csh)
            groups = 1
            assert spec.groups == 1, name

        bound = self.requant_bounds.get(name)
        mxu_ok = (
            bool(self.mxu_bf16)
            and groups == 1
            and bound is not None
            and bound < F32_EXACT_BOUND
            and (self.mxu_bf16 == "eligible" or spec.kernel == (1, 1))
        )
        y = _conv(
            x, w, spec.stride, spec.padding, groups, pad_value,
            exact_f32=mxu_ok,
        )

        # zero-point compensation 128*colsum(w): local w gives exactly this
        # device's share -- for col/shard that IS the sharded bias term; for
        # row the partial shares sum to the full compensation under the psum
        if not pl.input_symmetric:
            y = y + 128 * jnp.sum(w.astype(jnp.int32), axis=(0, 1, 2))

        if mode == "row":
            y = lax.psum(y, self.axis)
        y = y + p["b"]
        if pack_output_for is None and self.bf16_boundary:
            # boundary materializes as the bf16 real value (the int32
            # accumulator here is already the full post-psum total for row
            # mode, a channel shard of it for col/shard -- either way the
            # values equal int_engine._emit's input, so the bf16 conversion
            # is bit-identical to the single-device relaxed mode)
            v = (
                y.astype(jnp.float32) * float(2.0 ** -pl.out_fl)
            ).astype(jnp.bfloat16)
            return _TAct(v, pl.out_fl, sharded=mode in ("col", "shard"),
                         scaled=True)
        out = _TAct(
            y, pl.out_fl, sharded=mode in ("col", "shard"),
            abs_bound=self.requant_bounds.get(name),
        )
        if pack_output_for is not None:
            out = self.pack_for(out, pack_output_for)
        return out

    def relu_i32(self, act: _TAct) -> _TAct:
        return _TAct(
            jnp.maximum(act.x, 0), act.fl, sharded=act.sharded,
            abs_bound=act.abs_bound, scaled=act.scaled,
        )

    def add_int(self, res: _TAct, x: _TAct) -> _TAct:
        assert not res.sharded and not x.sharded
        if res.scaled or x.scaled:
            # relaxed-boundary mode: plain bf16 add (int_engine.add_int)
            assert res.scaled and x.scaled, "mixed boundary modes"
            return _TAct(res.x + x.x, max(res.fl, x.fl), scaled=True)
        # int8-boundary mode: widen a packed 1-byte carry exactly
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
        return _TAct(
            jnp.clip(r + v, -INT32_MAX, INT32_MAX), out_fl, abs_bound=ab
        )

    def classifier(self, act: _TAct):
        pl = self.plan["classifier"]
        p = self.params["classifier"]
        act = self.pack_for(act, "classifier")
        spec = self.graph["classifier"]
        csh = spec.in_features // self.nshard
        x = act.x if act.sharded else self._in_slice(act.x, csh)
        y = jnp.matmul(
            x.astype(jnp.int32), p["w"].astype(jnp.int32),
            preferred_element_type=jnp.int32,
        )
        if not pl.input_symmetric:
            y = y + 128 * jnp.sum(p["w"].astype(jnp.int32), axis=0)
        y = lax.psum(y, self.axis)
        y = y + p["b"]
        return y.astype(jnp.float32)


def _tp_body(
    model, plan, cfg, modes, axis, nshard, x, params, requant_bounds,
    mxu_bf16: str = "", bf16_boundary: bool = False,
    int8_boundary: bool = False,
):
    w = _TPWalker(
        model, plan, params, cfg, modes, axis, nshard,
        requant_bounds=requant_bounds, mxu_bf16=mxu_bf16,
        bf16_boundary=bf16_boundary, int8_boundary=int8_boundary,
    )
    fam = model.name
    head_pl = plan["head"]
    a = _TAct(x.astype(jnp.int32), head_pl.input_fl, abs_bound=256)

    if fam.startswith("resnet"):
        a = w.relu_i32(w.conv_int("head", a))
        if w.int8_boundary:
            # pack the stem activation before the pool (int8 maxpool,
            # 1 B/elt; int_engine._forward int8-boundary path)
            a = w.pack_for(a, model.blocks[0].body[0])
            a = _TAct(
                _maxpool(a.x, 3, 2, 1), a.fl, packed_for=a.packed_for,
            )
        else:
            # max commutes with the monotone scale: the bf16-boundary pool
            # is the same pooled value at 2 B/elt (int_engine._forward)
            a = _TAct(
                _maxpool(a.x, 3, 2, 1), a.fl, abs_bound=a.abs_bound,
                scaled=a.scaled,
            )
        ptargets = [m.body[0] for m in model.blocks[1:]] + [None]
        for meta, pt in zip(model.blocks, ptargets):
            v = a
            for prev, nxt in zip(meta.body[:-1], meta.body[1:]):
                v = w.conv_int(prev, v, pack_output_for=nxt)
            res = w.conv_int(meta.body[-1], v)
            s = a if meta.shortcut is None else w.conv_int(meta.shortcut, a)
            a = w.relu_i32(w.add_int(res, s))
            if w.int8_boundary and pt is not None:
                a = w.pack_for(a, pt)
    elif fam == "mobilenet_v1":
        consumers = [m.body[0] for m in model.blocks[1:]] + [None]
        a = w.conv_int("head", a, pack_output_for=model.blocks[0].body[0])
        for meta, nxt in zip(model.blocks, consumers):
            a = w.conv_int(meta.body[0], a, pack_output_for=meta.body[1])
            if nxt is not None:
                a = w.conv_int(meta.body[1], a, pack_output_for=nxt)
            else:
                a = w.relu_i32(w.conv_int(meta.body[1], a))
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
            v = a
            for prev, nn in zip(meta.body[:-1], meta.body[1:]):
                v = w.conv_int(prev, v, pack_output_for=nn)
            if meta.residual:
                res = w.conv_int(meta.body[-1], v)
                a = w.add_int(res, a)
                if w.int8_boundary:
                    a = w.pack_for(a, pt)
            elif w.int8_boundary and nxt is None:
                # next block is residual: pack its carry (int_engine)
                a = w.conv_int(meta.body[-1], v, pack_output_for=pt)
            else:
                a = w.conv_int(meta.body[-1], v, pack_output_for=nxt)
        a = w.relu_i32(w.conv_int("tail", a))

    if cfg.quant_avgpool:
        shift = avgpool_shift_for(getattr(model, "pool_kernel", 7))
        if a.scaled:
            # sum in f32 (a bf16 49-term sum would round), same
            # extent-derived shift as the integer path (int_engine._forward)
            pooled = (
                jnp.sum(a.x.astype(jnp.float32), (1, 2))
                * float(2.0**-shift)
            ).astype(jnp.bfloat16)
            a = _TAct(pooled, a.fl + shift, sharded=a.sharded, scaled=True)
        else:
            # the pool sum scales the static bound by the (trace-time)
            # extent, keeping the classifier-input requant f32-eligible; the
            # eligibility rule rejects oversized bounds itself, so this is
            # always safe
            ab = (
                None
                if a.abs_bound is None
                else a.abs_bound * a.x.shape[1] * a.x.shape[2]
            )
            a = _TAct(
                jnp.sum(a.x, (1, 2)),
                a.fl + shift,
                sharded=a.sharded,
                abs_bound=ab,
            )
    else:
        # reference float-mean fallback; a scaled act is already the real
        # value (int_engine._forward)
        m = jnp.mean(a.x.astype(jnp.float32), (1, 2))
        if not a.scaled:
            m = m / 2.0**a.fl
        pl = plan["classifier"]
        q, _ = fix_quant(m, 8, float(pl.input_fl), 1, pl.input_symmetric)
        a = _TAct(
            jnp.round(q * 2.0**pl.input_fl).astype(jnp.int32),
            pl.input_fl,
            sharded=a.sharded,
        )
    return w.classifier(a)


def tp_requant_bounds(model, plan, int_params):
    """Static per-layer |acc| bounds licensing the f32 requant epilogue in
    the TP walker: 128*sum|w| plus |b_zp| (the walker adds the recomputed
    zero-point compensation before the requant, so that IS the worst case).
    Needs CONCRETE host-visible params -- compute OUTSIDE jit (and, in
    multi-process runs, from the process-local copy before sharding) and
    pass the result via int_forward_tp(requant_bounds=...)."""
    from .int_engine import add_zero_point_bias, compute_requant_bounds

    return compute_requant_bounds(
        model, plan, add_zero_point_bias(model, plan, int_params)
    )


def _params_concrete(int_params):
    """True when every leaf can be read on this host: not a jit tracer and
    not a multi-process global array with remote shards."""
    import jax

    for leaf in jax.tree_util.tree_leaves(int_params):
        if isinstance(leaf, jax.core.Tracer):
            return False
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            return False
    return True


def int_forward_tp(
    model, plan, int_params, x, mesh: Mesh, cfg=None, axis: str = "model",
    f32_requant: bool = True, requant_bounds=None, mxu_bf16: str = "",
    bf16_boundary: bool = False, int8_boundary: bool = False,
):
    """Integer-only TP forward over a Mesh('data','model') with explicit
    collectives (see module docstring).  `x` is the conditioned input as for
    int_forward; int_params the baked {w:int8, b:int32[+b_zp]} pytree (the
    b_zp entries are ignored -- compensation is recomputed shard-locally).
    f32_requant enables the bit-exact f32 requant epilogue on layers whose
    static accumulator bound proves exactness (tp_requant_bounds; +35% at
    model level on MobileNetV2, 1 chip).  The bounds are Python ints and
    must come from concrete params: when this function is traced under an
    outer jit (params are tracers) or the params' shards span processes,
    pass precomputed `requant_bounds=tp_requant_bounds(...)` -- otherwise
    the walker falls back to the pure-integer requant (bit-identical, just
    slower).  bf16_boundary enables the relaxed-boundary throughput mode
    (int_engine.IntEngine bf16_boundary: boundaries as bf16 real values,
    integize-grade accuracy, NOT bit-exact to the int32 contract); the TP
    relaxed mode is bit-equal to the single-device relaxed mode because
    every boundary conversion runs on the post-psum int32 total."""
    import numpy as np

    cfg = cfg or model.cfg
    modes = tp_modes(model)
    nshard = mesh.shape[axis]
    pspecs = tp_param_specs(model, modes, axis)
    if requant_bounds is None and f32_requant and _params_concrete(int_params):
        requant_bounds = tp_requant_bounds(model, plan, int_params)
    if not f32_requant:
        requant_bounds = None
    # bias-less layers (LinearSpec(bias=False)) bake no 'b'; the walker adds
    # p['b'] unconditionally, so substitute zeros of the out dimension
    params = {
        name: {
            "w": entry["w"],
            "b": entry.get(
                "b", np.zeros((np.shape(entry["w"])[-1],), np.int32)
            ),
        }
        for name, entry in int_params.items()
    }

    def body(xb, pb):
        return _tp_body(
            model, plan, cfg, modes, axis, nshard, xb, pb, requant_bounds,
            mxu_bf16=mxu_bf16 if requant_bounds else "",
            bf16_boundary=bf16_boundary, int8_boundary=int8_boundary,
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data"), pspecs),
        out_specs=P("data"),
    )
    return fn(x, params)
