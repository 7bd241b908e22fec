"""Multi-head self-attention with per-head KAN projections + flash-attention block.

``MSA`` reproduces the reference's semantics (``attention.py:112-202``):
the model dim is split into ``n_heads`` slices, each head gets its own
``d_head -> d_head`` q/k/v projection (Linear or a KAN layer depending on
variant), attention is ``softmax(q k^T / sqrt(d_head)) v`` per head, and the
heads are concatenated back — with **no output projection and no dropout**
(SURVEY §2.9.4). The reference computes this with a per-sample, per-head
Python double loop; here the per-head projections are a single ``nn.vmap``
over a stacked ``(n_heads, ...)`` parameter axis and the attention is one
batched einsum — the same math as one MXU-friendly launch.

Variant dispatch parity (reference ``attention.py:136-170``): ``vanilla``,
``flash-attn`` and ``fourier`` use Linear projections (the fourier variant
KAN-ifies only the patch embedding), ``sine`` uses grid_size=4 in attention,
``cheby`` uses degree 4.
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from kanvit.layers.kan import (
    ChebyKANLayer,
    FastKANLayer,
    KANLinear,
    SineKANLayer,
    TorchLinear,
)


def _head_projection_cls_and_kwargs(kind: str, d_head: int,
                                    stateful_grid: bool = False):
    """Reference MSA dispatch table -> (module class, ctor kwargs)."""
    if kind in ("vanilla", "flash-attn", "fourier", "linear"):
        return TorchLinear, dict(in_features=d_head, out_features=d_head)
    if kind == "efficientkan":
        return KANLinear, dict(in_features=d_head, out_features=d_head,
                               stateful_grid=stateful_grid)
    if kind == "fast":
        return FastKANLayer, dict(input_dim=d_head, output_dim=d_head)
    if kind == "sine":
        # grid_size=4 in attention (reference attention.py:159)
        return SineKANLayer, dict(input_dim=d_head, output_dim=d_head, grid_size=4)
    if kind == "cheby":
        return ChebyKANLayer, dict(input_dim=d_head, output_dim=d_head, degree=4)
    # The reference swallows this error and fails later (SURVEY §2.9.6);
    # kanvit fails loudly at construction.
    raise ValueError(f"{kind} invalid. Please use a different argument.")


def _shared_basis_qkv(kind, x, d_head, pq, pk, pv):
    """Joint q/k/v projection sharing one basis expansion.

    ``x``: ``(B, T, H*dh)``; params are the per-head stacked trees of the
    three vmapped projection modules. Concatenates the three weight sets
    along the output axis and runs the KAN op once per head — via the
    slot-grouped kernel straight off the head-sliced activation when the
    shape allows (zero transposes on the projection side; see
    ``fused_basis.bspline_qkv_grouped``), else via vmap over a materialized
    ``(H, B, T, dh)`` transpose. Mathematically identical to three calls;
    saves 2/3 of the basis work on paths XLA cannot CSE (the Pallas custom
    calls are opaque to it). Returns ``(layout, (q, k, v))`` where layout is
    ``"lanes"`` (``(B, T, H*dh)``, head h at lanes h*dh:(h+1)*dh — feeds the
    zero-transpose lanes attention) when the slot-grouped kernels engaged,
    else ``"heads"`` (``(B, H, T, dh)``).
    """
    import jax

    from kanvit.kernels import fused_basis as FB
    from kanvit.ops import kan_bases as K

    b, t, d = x.shape
    n_heads = d // d_head
    grouped = os.environ.get("KANVIT_QKV_SG", "1") == "1"

    if kind == "efficientkan":
        bw = jnp.concatenate([pq["base_weight"], pk["base_weight"],
                              pv["base_weight"]], axis=1)  # (H, 3dh, dh)
        sw = jnp.concatenate([pq["spline_weight"], pk["spline_weight"],
                              pv["spline_weight"]], axis=1)
        sc = jnp.concatenate([pq["spline_scaler"], pk["spline_scaler"],
                              pv["spline_scaler"]], axis=1)
        if "grid" in pq:
            # Stateful (adaptive) grids: per-head (H, dh, knots). q/k/v see
            # the same input and the refit is deterministic in it, so their
            # grids stay identical — sharing q's is exact. (The grouped
            # kernel shares ONE grid table across heads, so stateful grids
            # keep the vmapped path.)
            grid, ysg = pq["grid"], None
        else:
            grid = K.make_bspline_grid(d_head)
            ysg = (FB.bspline_qkv_grouped(x.reshape(b * t, d), grid, bw, sw,
                                          sc, 3)
                   if grouped else None)
        if ysg is None:
            xh = jnp.moveaxis(x.reshape(b, t, n_heads, d_head), 2, 0)
            if "grid" in pq:
                y = jax.vmap(
                    lambda xh_h, g_h, bw_h, sw_h, sc_h: FB.bspline_kan(
                        xh_h, g_h, bw_h, sw_h, sc_h, 3
                    )
                )(xh, grid, bw, sw, sc)  # (H, B, T, 3dh)
            else:
                y = jax.vmap(
                    lambda xh_h, bw_h, sw_h, sc_h: FB.bspline_kan(
                        xh_h, grid, bw_h, sw_h, sc_h, 3
                    )
                )(xh, bw, sw, sc)  # (H, B, T, 3dh)
    else:  # cheby
        cc = jnp.concatenate([pq["cheby_coeffs"], pk["cheby_coeffs"],
                              pv["cheby_coeffs"]], axis=2)  # (H, dh, 3dh, D)
        ysg = (FB.cheby_qkv_grouped(x.reshape(b * t, d), cc)
               if grouped else None)
        if ysg is None:
            xh = jnp.moveaxis(x.reshape(b, t, n_heads, d_head), 2, 0)
            y = jax.vmap(FB.chebykan)(xh, cc)

    if ysg is not None:
        # (N, H*[q|k|v]) -> three (B, T, H*dh) lanes tensors: a strided
        # slice + free minor-merge reshape each (no head transpose).
        y4 = ysg.reshape(b, t, n_heads, 3 * d_head)
        return "lanes", tuple(
            y4[..., i * d_head : (i + 1) * d_head].reshape(b, t, d)
            for i in range(3)
        )
    yh = jnp.moveaxis(y, 0, 1)  # (H, B, T, 3dh) -> (B, H, T, 3dh)
    return "heads", (yh[..., :d_head], yh[..., d_head : 2 * d_head],
                     yh[..., 2 * d_head :])


def _fused_qkv_fast(x, d_head, pq, pk, pv):
    """Grouped-head FastKAN q/k/v: three slot-grouped launches straight off
    the (B, T, H*dh) activation (no basis sharing — each projection applies
    its own LN affine first, reference fastkan.py:66-70; see
    ``fused_basis.fastkan_qkv_grouped``). Returns (q, k, v) as lanes-layout
    (B, T, H*dh) tensors, or None when the tier does not apply."""
    from kanvit.kernels import fused_basis as FB

    if "base_weight" not in pq:  # use_base_update=False configs
        return None
    b, t, d = x.shape
    h = d // d_head
    x2d = x.reshape(b * t, d)
    ng = FastKANLayer.num_grids
    rbf_grid = jnp.linspace(FastKANLayer.grid_min, FastKANLayer.grid_max, ng)
    den = (FastKANLayer.grid_max - FastKANLayer.grid_min) / (ng - 1)
    outs = []
    for p_ in (pq, pk, pv):
        y = FB.fastkan_qkv_grouped(
            x2d, p_["ln_weight"], p_["ln_bias"], rbf_grid, den,
            p_["spline_weight"], p_["base_weight"], p_["base_bias"],
        )
        if y is None:
            return None
        outs.append(y.reshape(b, t, d))
    return tuple(outs)


def _fused_qkv_linear_bd(x, d_head, pq, pk, pv):
    """Head-stacked Linear q/k/v as ONE dense (D, D) block-diagonal matmul
    per projection in lanes layout (head h's (dh, dh) weight on the
    diagonal). The structural-zero MACs are trivial at D=384 while the
    head-major transposes the vmapped path needs are real HBM passes —
    only taken when the lanes attention will consume the result (the
    caller tests ``lanes_applicable`` first). Returns (q, k, v) as
    (B, T, H*dh)."""
    import jax

    b, t, d = x.shape
    h = d // d_head
    outs = []
    for p_ in (pq, pk, pv):
        # weight (H, out, in) torch-convention: block h contributes x_h @ W_h^T.
        wbd = jax.scipy.linalg.block_diag(
            *[p_["weight"][i].T for i in range(h)]
        )
        y = x @ wbd
        if "bias" in p_:
            y = y + p_["bias"].reshape(1, 1, d)
        outs.append(y)
    return tuple(outs)


def _fused_qkv_sine_grouped(x, d_head, grid_size, pq, pk, pv):
    """Grouped-head SineKAN q/k/v: three slot-grouped launches straight off
    the (B, T, H*dh) activation with in-kernel dfreq (no basis sharing —
    per-projection trainable freq, reference sinekan.py:65-70; see
    ``fused_basis.sinekan_qkv_grouped``). Returns (q, k, v) as lanes-layout
    (B, T, H*dh) tensors, or None when the tier does not apply."""
    from kanvit.kernels import fused_basis as FB
    from kanvit.ops import kan_bases as K

    b, t, d = x.shape
    phase = K.sinekan_phase_init(d_head, grid_size)
    x2d = x.reshape(b * t, d)
    outs = []
    for p_ in (pq, pk, pv):
        y = FB.sinekan_qkv_grouped(
            x2d, p_["freq"], phase, p_["amplitudes"], p_.get("bias")
        )
        if y is None:
            return None
        outs.append(y.reshape(b, t, d))
    return tuple(outs)


def _fused_qkv_sine(xh, d_head, grid_size, pq, pk, pv):
    """Per-head fused q/k/v sine projection (one kernel launch for the
    three projections — see ``fused_basis.sinekan_qkv``). The phase table
    is deterministic in (d_head, grid) and shared; freq/amplitudes/bias are
    the per-head stacked params of the three vmapped modules."""
    import jax

    from kanvit.kernels import fused_basis as FB
    from kanvit.ops import kan_bases as K

    phase = K.sinekan_phase_init(d_head, grid_size)

    def per_head(xh_h, fq, aq, bq, fk, ak, bk, fv, av, bv):
        return FB.sinekan_qkv(
            xh_h, (fq, fk, fv), phase, (aq, ak, av), (bq, bk, bv)
        )

    return jax.vmap(per_head)(
        xh,
        pq["freq"], pq["amplitudes"], pq["bias"],
        pk["freq"], pk["amplitudes"], pk["bias"],
        pv["freq"], pv["amplitudes"], pv["bias"],
    )


def _per_head_qkv_jnp(kind, x, d_head, pq, pk, pv, sine_grid=4):
    """Module-free per-head q/k/v on the jnp ground truth (``kanvit.ops``).

    The universal fallback inside ``_msa_sharded``'s shard_map body (bound
    flax modules cannot be called there): vmap the per-head closed forms
    over the stacked param axis. Returns heads-layout ``(B, H, T, dh)``
    tensors — value-identical to the vmapped module path.
    """
    import jax

    from kanvit.ops import kan_bases as K

    b, t, d = x.shape
    h = d // d_head
    xh = jnp.moveaxis(x.reshape(b, t, h, d_head), 2, 0)  # (H, B, T, dh)

    def apply(p):
        if "cheby_coeffs" in p:
            return jax.vmap(K.chebykan_forward)(xh, p["cheby_coeffs"])
        if "spline_scaler" in p or ("spline_weight" in p and p["spline_weight"].ndim == 4):
            grid = p.get("grid")
            if grid is None:
                g = K.make_bspline_grid(d_head)
                return jax.vmap(
                    lambda xx, bw, sw, sc: K.bspline_kan_forward(xx, g, bw, sw, sc, 3)
                )(xh, p["base_weight"], p["spline_weight"], p["spline_scaler"])
            return jax.vmap(
                lambda xx, g, bw, sw, sc: K.bspline_kan_forward(xx, g, bw, sw, sc, 3)
            )(xh, grid, p["base_weight"], p["spline_weight"], p["spline_scaler"])
        if "ln_weight" in p:  # fast
            ng = FastKANLayer.num_grids
            rbf_grid = jnp.linspace(FastKANLayer.grid_min, FastKANLayer.grid_max, ng)
            den = (FastKANLayer.grid_max - FastKANLayer.grid_min) / (ng - 1)
            return jax.vmap(
                lambda xx, lw, lb, sw, bw, bb: K.fastkan_forward(
                    xx, lw, lb, rbf_grid, den, sw, bw, bb
                )
            )(xh, p["ln_weight"], p["ln_bias"], p["spline_weight"],
              p["base_weight"], p["base_bias"])
        if "freq" in p:  # sine
            phase = K.sinekan_phase_init(d_head, sine_grid)
            return jax.vmap(
                lambda xx, f, a, bb: K.sinekan_forward(xx, f, phase, a, bb)
            )(xh, p["freq"], p["amplitudes"], p["bias"])
        # linear kinds: torch-convention (H, out, in) weight
        y = jnp.einsum("hbti,hoi->hbto", xh, p["weight"])
        if "bias" in p:
            y = y + p["bias"][:, None, None, :]
        return y

    q, k, v = apply(pq), apply(pk), apply(pv)
    return tuple(jnp.moveaxis(a, 0, 1) for a in (q, k, v))  # (B, H, T, dh)


def _fused_attend_local(x, pq, pk, pv, *, kind, d_head, n_heads, sine_grid=4):
    """One MSA attention pass as a pure function of (activation, raw param
    trees) — the per-shard body of ``_msa_sharded`` (and the math of the
    single-device fused path). Picks the same qkv tier cascade as
    ``MSA.__call__``, with the module-free jnp per-head fallback where a
    grouped tier does not apply at the (local) shape."""
    from kanvit.kernels.flash_attention import (
        flash_attention,
        flash_attention_lanes,
        lanes_applicable,
    )

    b, t, d = x.shape
    layout, qkv = None, None
    if kind in ("vanilla", "flash-attn", "fourier", "linear"):
        if (os.environ.get("KANVIT_QKV_BD", "1") == "1"
                and lanes_applicable(t, t, d, n_heads, x.dtype.itemsize)):
            layout, qkv = "lanes", _fused_qkv_linear_bd(x, d_head, pq, pk, pv)
    elif kind in ("efficientkan", "cheby"):
        layout, qkv = _shared_basis_qkv(kind, x, d_head, pq, pk, pv)
    elif kind == "fast" and os.environ.get("KANVIT_QKV_SG", "1") == "1":
        res = _fused_qkv_fast(x, d_head, pq, pk, pv)
        if res is not None:
            layout, qkv = "lanes", res
    elif kind == "sine" and os.environ.get("KANVIT_QKV_SG", "1") == "1":
        res = _fused_qkv_sine_grouped(x, d_head, sine_grid, pq, pk, pv)
        if res is not None:
            layout, qkv = "lanes", res
    if layout is None:
        layout, qkv = "heads", _per_head_qkv_jnp(
            kind, x, d_head, pq, pk, pv, sine_grid
        )

    q, k, v = qkv
    if layout == "lanes":
        out = flash_attention_lanes(q, k, v, n_heads)
        if out is not None:
            return out
        q, k, v = (
            a.reshape(b, t, n_heads, d_head).transpose(0, 2, 1, 3)
            for a in (q, k, v)
        )
    out = flash_attention(q, k, v)  # (B, H, T, dh)
    return jnp.moveaxis(out, 1, 2).reshape(b, t, d)


def _msa_sharded(x, pq, pk, pv, *, mesh, kind, d_head, n_heads, sine_grid=4):
    """MSA under an active multi-device mesh: heads over ``model``, batch
    over ``data``, kernels launched per shard inside ``shard_map``.

    The SPMD partitioner cannot shard a Pallas custom call, so the fused
    qkv/attention paths must never see mesh-sharded operands at the XLA
    level (``kanvit.parallel.runtime``). Each model shard slices its own
    contiguous head lanes of ``x`` (head h reads lanes ``h*dh:(h+1)*dh``),
    runs the full qkv-tier cascade + lanes attention on its local heads,
    and the output re-assembles as ``(B, T, H*dh)`` sharded
    ``P('data', None, 'model')`` — attention has no output projection
    (SURVEY §2.9.4), so the following LayerNorm's lane all-gather is the
    block's one TP collective. Returns None when the mesh cannot partition
    this shape (batch % data axis, heads % model axis); the caller then
    takes a partitioner-safe jnp path instead.
    """
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from kanvit.parallel import runtime

    b, t, d = x.shape
    nd = mesh.shape.get("data", 1)
    nm = mesh.shape.get("model", 1)
    if b % nd or n_heads % nm:
        return None
    if any(
        not hasattr(leaf, "shape") or leaf.shape[0] != n_heads
        for leaf in jax.tree.leaves((pq, pk, pv))
    ):
        return None
    hl = n_heads // nm

    def body(xl, pql, pkl, pvl):
        with runtime.local_region():
            if nm > 1:
                i = jax.lax.axis_index("model")
                xs = jax.lax.dynamic_slice_in_dim(
                    xl, i * hl * d_head, hl * d_head, axis=2
                )
            else:
                xs = xl
            return _fused_attend_local(
                xs, pql, pkl, pvl, kind=kind, d_head=d_head,
                n_heads=hl, sine_grid=sine_grid,
            )

    pspec = jax.tree.map(lambda _: P("model"), (pq, pk, pv))
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data"), *pspec),
        out_specs=P("data", None, "model"),
        check_vma=False,
    )(x, pq, pk, pv)


class MSA(nn.Module):
    """Multi-head self-attention with per-head variant projections."""

    d: int
    n_heads: int = 4
    type: str = "vanilla"
    stateful_grid: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.d % self.n_heads:
            raise ValueError(f"d={self.d} not divisible by n_heads={self.n_heads}")
        d_head = self.d // self.n_heads
        cls, kwargs = _head_projection_cls_and_kwargs(
            self.type, d_head, self.stateful_grid
        )

        # Stack the per-head modules along a leading axis: params get shape
        # (n_heads, ...) and the projection applies per head in one vmap.
        # "kan_inputs" only materializes on grid-update passes (sown layer
        # inputs, stacked per head like the params).
        def vmapped(name):
            V = nn.vmap(
                cls,
                in_axes=0,
                out_axes=0,
                variable_axes={"params": 0, "kan_inputs": 0,
                               "quant_amax": 0},
                split_rngs={"params": True},
                axis_size=self.n_heads,
            )
            return V(**kwargs, name=name)

        b, t, _ = x.shape

        qm, km, vm = (vmapped(n) for n in ("q_mappings", "k_mappings", "v_mappings"))

        # Multi-device mesh (kanvit.parallel.runtime): the SPMD partitioner
        # cannot shard Pallas custom calls, so under an active mesh the
        # fused paths run per-shard inside shard_map (_msa_sharded) and any
        # non-partitionable remainder runs the jnp twins whose HLO XLA
        # shards natively — a bare pallas_call never sees mesh-sharded
        # operands (rule documented in docs/ARCHITECTURE.md).
        from kanvit.ops import dispatch
        from kanvit.parallel import runtime

        mesh = None if self.is_initializing() else runtime.active_mesh()
        if mesh is not None and not self.stateful_grid:
            pq, pk, pv = (self.scope.get_variable("params", n)
                          for n in ("q_mappings", "k_mappings", "v_mappings"))
            out = _msa_sharded(
                x, pq, pk, pv, mesh=mesh, kind=self.type, d_head=d_head,
                n_heads=self.n_heads,
            )
            if out is not None:
                return out
        if mesh is not None and dispatch.use_pallas():
            with dispatch.jnp_scope():
                return self._attend_vmapped(x, qm, km, vm, d_head)

        # For basis families whose expansion is parameter-independent
        # (B-spline: deterministic grid; Chebyshev: T_n(tanh x)), compute the
        # basis ONCE and contract it against the q/k/v weights jointly.
        # The per-module calls are structurally SKIPPED on those paths —
        # XLA does not reliably DCE dead Pallas custom calls, so leaving
        # them in doubles the qkv work. They still run at init (to create
        # the unchanged parameter tree) and on stateful-grid passes (the
        # modules sow their inputs for --update-grid-every). fast is
        # excluded from sharing: its basis depends on per-projection params
        # (the internal LayerNorm).
        shared = self.type in ("efficientkan", "cheby")
        # Sine cannot share the basis (per-projection trainable freq) but
        # its q/k/v CAN stack into one launch via a block-diagonal weight
        # (fused_basis.sinekan_qkv). Measured at ViT-S this LOSES end-to-end
        # — the block-diagonal weight triples the dot FLOPs (632 vs 712
        # img/s, benchmarks/vits_breakdown_sine.json) — so it stays an A/B
        # hatch, off by default.
        sine_fused = (self.type == "sine"
                      and os.environ.get("KANVIT_SINE_QKV") == "1")
        # fast/sine cannot share a basis either (per-projection LN affine /
        # trainable freq), but each projection runs as one slot-grouped
        # launch over all heads (fastkan_qkv_grouped / sinekan_qkv_grouped);
        # falls back to the vmapped path when the tier does not apply.
        sg_on = os.environ.get("KANVIT_QKV_SG", "1") == "1"
        fast_grouped = self.type == "fast" and sg_on
        sine_grouped = self.type == "sine" and sg_on
        # Linear-projection kinds (vanilla/fourier): when the lanes
        # attention will engage, run qkv as block-diagonal (D, D) matmuls
        # in lanes layout instead of the vmapped head-major path — the
        # transposes around XLA's attention are real HBM passes.
        from kanvit.kernels.flash_attention import lanes_applicable

        linear_bd = (
            self.type in ("vanilla", "flash-attn", "fourier", "linear")
            and os.environ.get("KANVIT_QKV_BD", "1") == "1"
            and lanes_applicable(t, t, self.d, self.n_heads,
                                 x.dtype.itemsize)
        )
        fused_path = (shared or sine_fused or fast_grouped or sine_grouped
                      or linear_bd) \
            and not self.is_initializing() and not self.stateful_grid
        # (B, T, d) -> (H, B, T, d_head): head h sees x[..., h*dh:(h+1)*dh].
        # Only materialized on the paths that need the per-head layout —
        # the shared-basis path reads head lanes in place.
        def head_major():
            return jnp.moveaxis(x.reshape(b, t, self.n_heads, d_head), 2, 0)

        layout = "heads"
        if not fused_path:
            xh = head_major()
            q, k, v = qm(xh), km(xh), vm(xh)
            q, k, v = (jnp.moveaxis(a, 0, 1) for a in (q, k, v))
        else:
            # Unbound submodules cannot expose .variables; read the stacked
            # per-head params straight from this module's scope.
            pq, pk, pv = (self.scope.get_variable("params", n)
                          for n in ("q_mappings", "k_mappings", "v_mappings"))
            if linear_bd:
                layout = "lanes"
                q, k, v = _fused_qkv_linear_bd(x, d_head, pq, pk, pv)
            elif shared:
                layout, (q, k, v) = _shared_basis_qkv(
                    self.type, x, d_head, pq, pk, pv
                )
            elif fast_grouped:
                res = _fused_qkv_fast(x, d_head, pq, pk, pv)
                if res is None:  # tier not applicable at this shape
                    xh = head_major()
                    q, k, v = qm(xh), km(xh), vm(xh)
                    q, k, v = (jnp.moveaxis(a, 0, 1) for a in (q, k, v))
                else:
                    layout, (q, k, v) = "lanes", res
            else:
                res = (_fused_qkv_sine_grouped(x, d_head, 4, pq, pk, pv)
                       if sine_grouped else None)
                if res is not None:
                    layout, (q, k, v) = "lanes", res
                elif sine_fused:
                    q, k, v = _fused_qkv_sine(
                        head_major(), d_head, 4, pq, pk, pv
                    )
                    q, k, v = (jnp.moveaxis(a, 0, 1) for a in (q, k, v))
                else:  # sg tier inapplicable at this shape: vmapped path
                    xh = head_major()
                    q, k, v = qm(xh), km(xh), vm(xh)
                    q, k, v = (jnp.moveaxis(a, 0, 1) for a in (q, k, v))
        from kanvit.kernels.flash_attention import (
            flash_attention,
            flash_attention_lanes,
        )

        if layout == "lanes":
            # Zero-transpose block: slot-grouped qkv emitted (B, T, H*dh)
            # and the lanes attention returns the head-concat layout the
            # next layer consumes directly.
            out = flash_attention_lanes(q, k, v, self.n_heads)
            if out is not None:
                return out
            q, k, v = (
                a.reshape(b, t, self.n_heads, d_head).transpose(0, 2, 1, 3)
                for a in (q, k, v)
            )
        # The dispatched entry: XLA fused attention below the engage
        # threshold (identical math to multi_head_attention incl. the
        # d**-0.5 scale), the Pallas single-tile/flash kernels above it
        # (KANVIT_ATTN_MIN_SEQ A/Bs the threshold end-to-end).
        out = flash_attention(q, k, v)  # (B, H, T, dh)
        # concat heads in order == reshape back
        return jnp.moveaxis(out, 1, 2).reshape(b, t, self.d)

    def _attend_vmapped(self, x, qm, km, vm, d_head):
        """The vmapped per-head module path + attention tail — the
        partitioner-safe route under an active mesh when ``_msa_sharded``
        cannot engage (indivisible batch/heads, stateful grids): its
        einsums and sows are plain HLO the partitioner shards natively
        (callers wrap it in ``dispatch.jnp_scope()``)."""
        from kanvit.kernels.flash_attention import flash_attention

        b, t, _ = x.shape
        xh = jnp.moveaxis(x.reshape(b, t, self.n_heads, d_head), 2, 0)
        q, k, v = qm(xh), km(xh), vm(xh)
        q, k, v = (jnp.moveaxis(a, 0, 1) for a in (q, k, v))
        out = flash_attention(q, k, v)
        return jnp.moveaxis(out, 1, 2).reshape(b, t, self.d)


class FlashAttentionBlock(nn.Module):
    """Flash-attention module (reference ``attention.py:13-109``).

    Projections ``to_q (dim -> h*dh)``, ``to_kv (dim -> 2*h*dh)``,
    ``to_out (h*dh -> dim)``, all bias-free; default ``dim_head=64``,
    bucket sizes 512/1024 become the Pallas kernel's block sizes. In the
    ``flash-attn`` ViT variant these blocks are applied raw — no LayerNorm,
    feed-forward, or residual (reference ``model.py:93-95,156-159``,
    SURVEY §2.9.5).
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    causal: bool = False
    q_bucket_size: int = 512
    k_bucket_size: int = 1024
    # Sequence parallelism: name of an active-mesh axis to shard T over.
    # When set (and a runtime mesh with that axis is active), self-attention
    # runs as ring attention — k/v chunks rotate across devices via
    # ppermute with per-device online-softmax accumulation
    # (kanvit/parallel/ring_attention.py) — scaling reachable sequence
    # length linearly with the ring. Long-context extension beyond the
    # reference (whose max sequence is 197 tokens).
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        q_bucket_size: Optional[int] = None,
        k_bucket_size: Optional[int] = None,
    ) -> jnp.ndarray:
        from kanvit.kernels.flash_attention import (
            flash_attention,
            flash_attention_lanes,
        )

        qb = q_bucket_size or self.q_bucket_size
        kb = k_bucket_size or self.k_bucket_size
        inner = self.heads * self.dim_head
        ctx = x if context is None else context

        q = TorchLinear(self.dim, inner, use_bias=False, name="to_q")(x)
        kv = TorchLinear(self.dim, inner * 2, use_bias=False, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)

        b, t, _ = q.shape
        tk = k.shape[1]

        def to_heads(a, tt):
            return a.reshape(b, tt, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        # Sequence-parallel path: self-attention with T sharded over the
        # named mesh axis rides the ring (mask/cross-attention shapes fall
        # through to the standard entries below).
        if (self.seq_axis and not self.is_initializing()
                and context is None and mask is None and tk == t):
            from kanvit.parallel import runtime
            from kanvit.parallel.ring_attention import ring_attention

            mesh = runtime.active_mesh()
            n = mesh.shape.get(self.seq_axis, 1) if mesh is not None else 1
            if n > 1 and t % n == 0:
                out = ring_attention(
                    to_heads(q, t), to_heads(k, t), to_heads(v, t),
                    mesh=mesh, axis_name=self.seq_axis, causal=self.causal,
                )
                out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
                return TorchLinear(inner, self.dim, use_bias=False,
                                   name="to_out")(out)

        # The projections already emit/consume the head-concat (B, T, H*dh)
        # layout — at single-tile shapes the lanes kernel runs attention in
        # place with zero head split/merge relayouts.
        out_l = None if self.is_initializing() else flash_attention_lanes(
            q, k, v, self.heads, causal=self.causal, mask=mask,
            q_block=qb, k_block=kb,
        )
        if out_l is not None:
            return TorchLinear(inner, self.dim, use_bias=False,
                               name="to_out")(out_l)

        out = flash_attention(
            to_heads(q, t),
            to_heads(k, tk),
            to_heads(v, tk),
            causal=self.causal,
            q_block=qb,
            k_block=kb,
            mask=mask,
        )  # (B, H, T, dh)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        return TorchLinear(inner, self.dim, use_bias=False, name="to_out")(out)
