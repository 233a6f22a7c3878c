"""Pipeline-parallel integer engine: GPipe-style SPMD pipelining of the
int8 graph over a 'pipe' mesh axis (shard_map + ppermute).

The reference has no pipeline parallelism at all (SURVEY.md §2.6 P3 --
`myutils/distributed.py` is NCCL data-parallel only); this is the TPU-native
scale-out story for models/activations that exceed one device: contiguous
stages of the layer graph live on different devices, each device holds ONLY
its stage's weights, and microbatches stream through the pipe with a
ppermute ring carrying the inter-stage activation.

Design (one SPMD program, no per-device programs):

  * The single-device walk (engine/int_engine.py `_forward`) is factored
    into an ordered list of **units** -- head(+maxpool), one unit per block,
    tail, global-pool+classifier -- with exactly the same requant-fusion
    structure (`pack_output_for` chains), so every intermediate value is
    bit-identical to the single-device engine by construction.
  * Units are grouped into S contiguous **stages** (S = mesh.shape['pipe']).
    Each stage's parameters are flattened into one int8 byte blob; the
    [S, max_blob] stack is sharded P('pipe') so weights are device-local.
  * One `lax.scan` over T = M + S - 1 ticks runs the GPipe schedule: at tick
    t, stage s computes microbatch t - s.  `lax.switch(axis_index('pipe'))`
    selects the stage body; the boundary activation travels as a
    fixed-size int8 byte buffer (int32 tensors bitcast to bytes; activations
    that the single-device engine packs to int8 cross the wire at
    1 byte/element) moved by a single `ppermute` step per tick.
  * The last stage accumulates logits per microbatch (bubble ticks write to
    a scratch row); a final psum replicates them so the caller sees the full
    [batch, classes] output.

Bit-exactness: stages execute the unmodified `_Walker` methods on full
(unsharded) tensors -- the only new operations are byte-preserving
bitcasts and data movement -- so PP logits are BIT-EQUAL to
engine/int_engine.py on any stage count (tests/test_pp_engine.py).

Costs (inherent to SPMD pipelining): every device compiles all S stage
bodies (executes only its own), and the pipeline has the usual
(S-1)/(M+S-1) bubble fraction -- pick M >= 2S.  The input microbatch
stream is replicated over the pipe axis; a production deployment would
feed stage 0's host only.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fxp import fix_quant
from ..nn.quant_layers import avgpool_shift_for
from .int_engine import IAct, _block_mbv2_int, _block_resnet_int, _classifier_int, _maxpool, _Walker, add_zero_point_bias


def build_units(model, plan, cfg, maxpool_impl: str = "single"):
    """Factor the single-device integer walk into an ordered unit list.

    Returns (units, layer_sets): units[i] is fn(walker, IAct) -> IAct (the
    final unit returns the float32 logits array); layer_sets[i] is the set
    of layer names whose params unit i reads.  The pack_output_for chains
    are identical to int_engine._forward, so values match bit-for-bit.
    """
    fam = model.name
    units, layer_sets = [], []

    if fam.startswith("resnet"):
        first_body0 = model.blocks[0].body[0]

        def u_head(w, a):
            a = w.relu_i32(w.conv_int("head", a))
            if w.int8_boundary:
                # int8-boundary mode: pack before the pool (1 B/elt stem)
                a = w.pack_for(a, first_body0)
                return IAct(
                    _maxpool(a.x, 3, 2, 1, impl=maxpool_impl), a.fl,
                    packed_for=a.packed_for,
                )
            # max commutes with the monotone scale (bf16_boundary mode)
            return IAct(
                _maxpool(a.x, 3, 2, 1, impl=maxpool_impl), a.fl,
                abs_bound=a.abs_bound, scaled=a.scaled,
            )

        units.append(u_head)
        layer_sets.append({"head"})
        ptargets = [m.body[0] for m in model.blocks[1:]] + [None]
        for meta, pt in zip(model.blocks, ptargets):
            units.append(
                lambda w, a, meta=meta, pt=pt: _block_resnet_int(
                    w, meta, a, pack_target=pt
                )
            )
            ls = set(meta.body)
            if meta.shortcut is not None:
                ls.add(meta.shortcut)
            layer_sets.append(ls)
    elif fam == "mobilenet_v1":
        first = model.blocks[0].body[0]
        units.append(lambda w, a: w.conv_int("head", a, pack_output_for=first))
        layer_sets.append({"head"})
        consumers = [m.body[0] for m in model.blocks[1:]] + [None]
        for meta, nxt in zip(model.blocks, consumers):
            def u_blk(w, a, meta=meta, nxt=nxt):
                a = w.conv_int(meta.body[0], a, pack_output_for=meta.body[1])
                if nxt is not None:
                    return w.conv_int(meta.body[1], a, pack_output_for=nxt)
                return w.relu_i32(w.conv_int(meta.body[1], a))

            units.append(u_blk)
            layer_sets.append(set(meta.body))
    elif fam == "mobilenet_v2":
        first = model.blocks[0]
        units.append(
            lambda w, a: w.conv_int(
                "head", a,
                pack_output_for=None if first.residual else first.body[0],
            )
        )
        layer_sets.append({"head"})
        consumers = []
        for k in range(1, len(model.blocks)):
            nxt = model.blocks[k]
            consumers.append(None if nxt.residual else nxt.body[0])
        consumers.append("tail")
        ptargets = [m.body[0] for m in model.blocks[1:]] + ["tail"]
        for meta, nxt, pt in zip(model.blocks, consumers, ptargets):
            def u_blk(w, a, meta=meta, nxt=nxt, pt=pt):
                return _block_mbv2_int(w, meta, a, nxt, pack_target=pt)

            units.append(u_blk)
            layer_sets.append(set(meta.body))
        units.append(lambda w, a: w.relu_i32(w.conv_int("tail", a)))
        layer_sets.append({"tail"})
    else:  # pragma: no cover
        raise ValueError(f"unknown family {fam}")

    pk = getattr(model, "pool_kernel", 7)

    def u_final(w, a):
        if cfg.quant_avgpool:
            shift = avgpool_shift_for(pk)
            if a.scaled:
                # relaxed-boundary mode: f32 sum (a bf16 49-term sum would
                # round), same extent-derived shift (see int_engine._forward)
                pooled = (
                    jnp.sum(a.x.astype(jnp.float32), (1, 2))
                    * float(2.0**-shift)
                ).astype(jnp.bfloat16)
                a = IAct(pooled, a.fl + shift, scaled=True)
            else:
                # pool sum scales the static bound by the extent
                ab = (
                    None
                    if a.abs_bound is None
                    else a.abs_bound * a.x.shape[1] * a.x.shape[2]
                )
                a = IAct(
                    jnp.sum(a.x, (1, 2)),
                    a.fl + shift,
                    abs_bound=ab,
                )
        else:
            m = jnp.mean(a.x.astype(jnp.float32), (1, 2))
            if not a.scaled:
                m = m / 2.0**a.fl
            pl = plan["classifier"]
            q, _ = fix_quant(m, 8, float(pl.input_fl), 1, pl.input_symmetric)
            a = IAct(
                jnp.round(q * 2.0**pl.input_fl).astype(jnp.int32), pl.input_fl
            )
        return _classifier_int(w, a)

    units.append(u_final)
    layer_sets.append({"classifier"})
    return units, layer_sets


def stage_bounds(n_units: int, n_stages: int):
    """Contiguous unit ranges per stage: [start, end) pairs, near-even."""
    assert 2 <= n_stages <= n_units, (n_stages, n_units)
    cuts = np.linspace(0, n_units, n_stages + 1).round().astype(int)
    return [(int(a), int(b)) for a, b in zip(cuts[:-1], cuts[1:])]


def _nbytes(struct) -> int:
    return int(np.prod(struct.shape)) * np.dtype(struct.dtype).itemsize


def _enc(x, total: int):
    """Array -> zero-padded int8 byte buffer (int32 bitcast to 4 bytes,
    bf16 boundaries -- relaxed mode -- to 2)."""
    flat = x.reshape(-1)
    if flat.dtype != jnp.int8:
        assert flat.dtype in (jnp.int32, jnp.bfloat16), flat.dtype
        flat = lax.bitcast_convert_type(flat, jnp.int8).reshape(-1)
    pad = total - flat.shape[0]
    assert pad >= 0, (total, flat.shape)
    return jnp.pad(flat, (0, pad)) if pad else flat


def _dec(buf, shape, dtype):
    n = int(np.prod(shape))
    if np.dtype(dtype) == np.int32:
        v = lax.bitcast_convert_type(buf[: 4 * n].reshape(n, 4), jnp.int32)
    elif np.dtype(dtype) == np.dtype(jnp.bfloat16):
        v = lax.bitcast_convert_type(
            buf[: 2 * n].reshape(n, 2), jnp.bfloat16
        )
    else:
        assert np.dtype(dtype) == np.int8, dtype
        v = buf[:n]
    return v.reshape(shape)


class PPEngine:
    """Pipeline-parallel integer inference over a mesh with a 'pipe' axis.

    Usage::

        mesh = make_pipe_mesh(4)
        eng = PPEngine(model, plan, int_params, mesh, microbatches=8)
        logits = eng(x)          # x: conditioned int input, B % 8 == 0

    Composes with data parallelism: on a 2-D Mesh(('data','pipe')) pass
    data_axis='data' and each data shard runs the same pipeline over its
    slice of every microbatch (weights replicated over 'data', stage-local
    over 'pipe'; the ppermute ring and final psum stay pipe-only).

    Output is bit-equal to engine.IntEngine on the same inputs.
    """

    def __init__(
        self, model, plan, int_params, mesh: Mesh, microbatches: int,
        axis: str = "pipe", cfg=None, bounds=None, maxpool_impl: str = "single",
        data_axis: str | None = None, f32_requant: bool = True,
        mxu_bf16: str = "", bf16_boundary: bool = False,
        int8_boundary: bool = False,
    ):
        # relaxed-boundary throughput mode (int_engine.IntEngine): the walker
        # emits bf16 boundaries; the pipe wire carries them at 2 B/elt (half
        # the int32 contract's boundary bytes) via the bf16 bitcast in _enc
        self.bf16_boundary = bf16_boundary
        # 1-byte boundary mode: stage walkers pack carries onto the next
        # conv's grid; packed boundaries cross the pipe wire at 1 B/elt
        # (the metadata already carries packed_for)
        self.int8_boundary = int8_boundary
        self.model = model
        self.plan = plan
        self.cfg = cfg or model.cfg
        self.mesh = mesh
        self.axis = axis
        self.data_axis = data_axis
        self.D = int(mesh.shape[data_axis]) if data_axis else 1
        self.M = int(microbatches)
        self.S = int(mesh.shape[axis])
        units, layer_sets = build_units(model, plan, self.cfg, maxpool_impl)
        self.bounds = bounds or stage_bounds(len(units), self.S)
        assert len(self.bounds) == self.S
        self._stage_units = [units[a:b] for a, b in self.bounds]
        stage_layers = [
            sorted(set().union(*layer_sets[a:b])) for a, b in self.bounds
        ]
        ip = add_zero_point_bias(model, plan, int_params)
        # static per-layer |acc+bias| bounds licensing the bit-exact f32
        # requant epilogue (int_engine.compute_requant_bounds); the wire
        # metadata carries each boundary's bound so cross-stage requants
        # stay eligible too
        from .int_engine import compute_requant_bounds

        self._rq_bounds = (
            compute_requant_bounds(model, plan, ip) if f32_requant else None
        )
        # bf16-operand MXU convs (int_engine mxu_bf16 policy); needs bounds
        self._mxu_bf16 = mxu_bf16 if self._rq_bounds else ""
        self._pack_params(ip, stage_layers)
        self._programs = {}

    # -- parameter packing ----------------------------------------------

    def _pack_params(self, int_params, stage_layers):
        """Flatten each stage's param dict into one int8 blob; stack
        [S, max] and shard it over the pipe axis (device-local weights)."""
        blobs, self._pentries = [], []
        for layers in stage_layers:
            off, entries, parts = 0, [], []
            for lname in layers:
                for key in sorted(int_params[lname]):
                    arr = np.ascontiguousarray(np.asarray(int_params[lname][key]))
                    assert arr.dtype in (np.int8, np.int32), (lname, key, arr.dtype)
                    raw = np.frombuffer(arr.tobytes(), np.int8)
                    entries.append((lname, key, off, raw.size, arr.shape, arr.dtype))
                    parts.append(raw)
                    off += raw.size
            self._pentries.append(entries)
            blobs.append(
                np.concatenate(parts) if parts else np.zeros(0, np.int8)
            )
        wmax = max(b.size for b in blobs)
        stack = np.zeros((self.S, wmax), np.int8)
        for s, b in enumerate(blobs):
            stack[s, : b.size] = b
        self._pstack = jax.device_put(
            stack, NamedSharding(self.mesh, P(self.axis))
        )

    def _unpack(self, prow, s: int):
        params = {}
        for lname, key, off, nb, shape, dtype in self._pentries[s]:
            seg = prow[off : off + nb]
            if np.dtype(dtype) == np.int32:
                arr = lax.bitcast_convert_type(
                    seg.reshape(nb // 4, 4), jnp.int32
                )
            else:
                arr = seg
            params.setdefault(lname, {})[key] = arr.reshape(shape)
        return params

    # -- stage execution ---------------------------------------------------

    def _run_stage(self, s: int, params, x, in_meta):
        w = _Walker(
            self.model, self.plan, params, self.cfg, int_only=True,
            requant_bounds=self._rq_bounds, mxu_bf16=self._mxu_bf16,
            bf16_boundary=self.bf16_boundary,
            int8_boundary=self.int8_boundary,
        )
        if s == 0:
            act = IAct(
                x.astype(jnp.int32), self.plan["head"].input_fl, abs_bound=256
            )
        else:
            fl, pf, ab, sc = in_meta
            act = IAct(x, fl, packed_for=pf, abs_bound=ab, scaled=sc)
        for u in self._stage_units[s]:
            act = u(w, act)
        return act  # IAct, or the logits array from the final unit

    def _trace_boundaries(self, mb, hw, in_dtype):
        """eval_shape every stage in sequence to collect the static wire
        metadata: per-boundary (shape, dtype, fl, packed_for) + logits."""
        metas = [None]  # stage 0 reads the image stream
        x_struct = jax.ShapeDtypeStruct((mb, hw[0], hw[1], hw[2]), in_dtype)
        out_struct = None
        for s in range(self.S):
            pstruct = {}
            for lname, key, _, _, shape, dtype in self._pentries[s]:
                pstruct.setdefault(lname, {})[key] = jax.ShapeDtypeStruct(
                    shape, dtype
                )
            hold = {}

            def f(xx, pp, s=s, hold=hold):
                a = self._run_stage(s, pp, xx, metas[s] and metas[s][2:])
                if isinstance(a, IAct):
                    hold["m"] = (a.fl, a.packed_for, a.abs_bound, a.scaled)
                    return a.x
                return a

            out_struct = jax.eval_shape(f, x_struct, pstruct)
            if s < self.S - 1:
                metas.append(
                    (out_struct.shape, out_struct.dtype) + hold["m"]
                )
                x_struct = out_struct
        return metas, out_struct  # final out_struct = logits [mb, ncls]

    # -- the pipelined program ----------------------------------------------

    def _program(self, mb, hw, in_dtype):
        # mb is the per-data-shard microbatch size: all boundary metadata and
        # stage bodies trace at local shapes (shard_map is per-device code)
        S, M, axis = self.S, self.M, self.axis
        vaxes = (axis, self.data_axis) if self.data_axis else (axis,)
        metas, logit_struct = self._trace_boundaries(mb, hw, in_dtype)
        ncls = logit_struct.shape[-1]
        maxbytes = max(
            _nbytes(jax.ShapeDtypeStruct(m[0], m[1])) for m in metas[1:]
        )

        def branch(s):
            def br(buf, prow, sm):
                params = self._unpack(prow, s)
                if s == 0:
                    x, meta = sm, None
                else:
                    shape, dtype, fl, pf, ab, sc = metas[s]
                    x, meta = _dec(buf, shape, dtype), (fl, pf, ab, sc)
                a = self._run_stage(s, params, x, meta)
                # every branch's outputs must carry the same "varies over
                # pipe" type for lax.switch -- pcast the constant halves
                vary = lambda v: lax.pcast(v, vaxes, to="varying")
                if s == S - 1:
                    return vary(jnp.zeros((maxbytes,), jnp.int8)), a
                return _enc(a.x, maxbytes), vary(
                    jnp.zeros((mb, ncls), jnp.float32)
                )

            return br

        branches = [branch(s) for s in range(S)]
        perm = [(i, i + 1) for i in range(S - 1)]

        def body(stream, pst):
            prow = pst[0]
            s_idx = lax.axis_index(axis)

            def tick(carry, t):
                cur, acc = carry
                sm = lax.dynamic_index_in_dim(
                    stream, jnp.clip(t, 0, M - 1), 0, keepdims=False
                )
                out_buf, logits = lax.switch(s_idx, branches, cur, prow, sm)
                nxt = lax.ppermute(out_buf, axis, perm)
                idx = t - (S - 1)
                valid = jnp.logical_and(s_idx == S - 1, idx >= 0)
                acc = lax.dynamic_update_index_in_dim(
                    acc, logits, jnp.where(valid, idx, M), 0
                )
                return (nxt, acc), None

            init = (
                lax.pcast(jnp.zeros((maxbytes,), jnp.int8), vaxes, to="varying"),
                lax.pcast(
                    jnp.zeros((M + 1, mb, ncls), jnp.float32), vaxes, to="varying"
                ),
            )
            (_, acc), _ = lax.scan(tick, init, jnp.arange(M + S - 1))
            return lax.psum(acc[:M], axis)

        dspec = P(None, self.data_axis) if self.data_axis else P()
        fn = shard_map(
            body, mesh=self.mesh, in_specs=(dspec, P(axis)), out_specs=dspec
        )
        return jax.jit(fn)

    def __call__(self, x):
        """x: conditioned integer input [B, H, W, C] (as for IntEngine),
        B divisible by `microbatches` (and the microbatch by the data-axis
        size)."""
        b = x.shape[0]
        assert b % self.M == 0, (b, self.M)
        mb = b // self.M
        assert mb % self.D == 0, (mb, self.D)
        key = (mb, x.shape[1:], jnp.dtype(x.dtype).name)
        if key not in self._programs:
            self._programs[key] = self._program(mb // self.D, x.shape[1:], x.dtype)
        stream = x.reshape((self.M, mb) + x.shape[1:])
        out = self._programs[key](stream, self._pstack)
        return out.reshape(self.M * mb, out.shape[-1])


def make_pipe_mesh(n_stages: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices[:n_stages]), ("pipe",))
