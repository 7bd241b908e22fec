"""Fused pre-LN transformer feed-forward kernel.

The reference block's FF chain (``model.py:14-37``):
``x + W2 @ relu(W1 @ LN(x) + b1) + b2`` with torch-convention ``(out, in)``
weights. XLA runs it as two well-shaped matmuls, but the ``(N, F)``
intermediate round-trips HBM between them (~148 MB bf16 at the ViT-S shape,
~1.1 ms/block of the measured 2.9 ms in-block FF cost — the dot floor is
1.8 ms), and the LN + residual epilogues are further full-tensor passes.
This kernel streams row blocks once: LN statistics, both dots, the ReLU and
the residual all happen on a VMEM-resident block, so HBM sees exactly one
read of ``x`` (+ cotangent on the backward) and one write per output. The
backward recomputes LN and the first dot from ``x`` (the split-residual
A/Bs in this repo consistently show a ~150 MB round trip losing to
recompute) and accumulates all six parameter gradients in VMEM across the
row-block grid, torch-layout, in f32.

Ground truth: ``kanvit.ops.kan_bases.ffn_pre_ln`` (values + VJP parity in
``tests/test_kernels.py``).

MEASURED NEGATIVE end-to-end on v5e — opt-in via ``KANVIT_FF=1``. Isolated
the kernel ties-or-wins (chained ViT-S component: FF 4.28 vs 4.57 ms,
12-block chain 101.8 vs 105.2 ms), but the full vanilla step LOSES 3,119
vs 3,230 img/s (82.1 vs 79.3 ms; efficientkan 1,556 in the same session).
Same mechanism as the short-sequence attention verdict
(docs/PERFORMANCE.md): the custom call is an optimization barrier — XLA
fuses the FF backward's dW matmuls and epilogues into the optimizer/step
program, and that composition is worth more than the kernel's isolated
HBM savings. The kernels that DO win end-to-end in this repo all remove
layout passes XLA cannot elide (transposes, head packing); the FF chain
has none.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kanvit.kernels.fused_basis import _dot_dtype, _round_up
from kanvit.ops import dispatch

_EPS = 1e-5
# Scoped-VMEM ceiling: the backward's live set (three 1.2 MB bf16 weight
# panels, two 2.4 MB f32 weight-grad accumulators, ~5 (bn, F) f32 temps)
# exceeds Mosaic's 16 MB default at useful row blocks.
_VMEM_LIMIT = 96 * 1024 * 1024


def _ln_stats(xr, gam, bet):
    """Full-width LayerNorm on an f32 row block; returns (xhat, ln, rstd)."""
    m = jnp.mean(xr, axis=1, keepdims=True)
    xc = xr - m
    v = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(v + _EPS)
    xhat = xc * rstd
    return xhat, xhat * gam + bet, rstd


def _ffn_fwd_kernel(xr_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, gam_ref,
                    bet_ref, y_ref):
    xr = xr_ref[:].astype(jnp.float32)
    _, ln, _ = _ln_stats(xr, gam_ref[:].astype(jnp.float32),
                         bet_ref[:].astype(jnp.float32))
    dd = w1t_ref.dtype
    h = jax.lax.dot_general(
        ln.astype(dd), w1t_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]
    r = jnp.maximum(h, 0.0)
    y = jax.lax.dot_general(
        r.astype(dd), w2t_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:] + xr
    y_ref[:] = y.astype(y_ref.dtype)


def _ffn_bwd_kernel(xr_ref, g_ref, w1t_ref, w1_ref, w2_ref, b1_ref, gam_ref,
                    bet_ref,
                    dx_ref, dw1_ref, dw2_ref, db1_ref, db2_ref, dgam_ref,
                    dbet_ref,
                    dw1_acc, dw2_acc, dvf_acc, dvd_acc):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dw1_acc[:] = jnp.zeros_like(dw1_acc)
        dw2_acc[:] = jnp.zeros_like(dw2_acc)
        dvf_acc[:] = jnp.zeros_like(dvf_acc)
        dvd_acc[:] = jnp.zeros_like(dvd_acc)

    xr = xr_ref[:].astype(jnp.float32)
    gam = gam_ref[:].astype(jnp.float32)
    xhat, ln, rstd = _ln_stats(xr, gam, bet_ref[:].astype(jnp.float32))
    dd = w1_ref.dtype
    lnd = ln.astype(dd)
    h = jax.lax.dot_general(
        lnd, w1t_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]
    g = g_ref[:].astype(jnp.float32)
    gd = g.astype(dd)
    r = jnp.maximum(h, 0.0)
    # dW2 (torch (D, F)): g^T r. Padded tail rows carry zero cotangents, so
    # they contribute nothing to any accumulator.
    dw2_acc[:] += jax.lax.dot_general(
        gd, r.astype(dd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dr = jax.lax.dot_general(
        gd, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = jnp.where(h > 0.0, dr, 0.0)
    dhd = dh.astype(dd)
    dw1_acc[:] += jax.lax.dot_general(
        dhd, lnd, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dlnp = jax.lax.dot_general(
        dhd, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dvf_acc[0:1, :] += jnp.sum(dh, axis=0, keepdims=True)       # db1
    dvd_acc[0:1, :] += jnp.sum(g, axis=0, keepdims=True)        # db2
    dvd_acc[1:2, :] += jnp.sum(dlnp * xhat, axis=0, keepdims=True)  # dgamma
    dvd_acc[2:3, :] += jnp.sum(dlnp, axis=0, keepdims=True)     # dbeta
    gs = dlnp * gam
    m1 = jnp.mean(gs, axis=1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=1, keepdims=True)
    dx_ref[:] = (g + rstd * (gs - m1 - xhat * m2)).astype(dx_ref.dtype)

    @pl.when(i == n_i - 1)
    def _finish():
        dw1_ref[:] = dw1_acc[:].astype(dw1_ref.dtype)
        dw2_ref[:] = dw2_acc[:].astype(dw2_ref.dtype)
        db1_ref[:] = dvf_acc[0:1, :].astype(db1_ref.dtype)
        db2_ref[:] = dvd_acc[0:1, :].astype(db2_ref.dtype)
        dgam_ref[:] = dvd_acc[1:2, :].astype(dgam_ref.dtype)
        dbet_ref[:] = dvd_acc[2:3, :].astype(dbet_ref.dtype)


def _bn(n, dd):
    # The (bn, F) f32 temps dominate; bf16 dots leave room for 512 rows
    # under the raised scoped-VMEM limit, f32 halves that. KANVIT_FF_BN
    # overrides (tests shrink it to exercise multi-block accumulation).
    env = os.environ.get("KANVIT_FF_BN")
    cap = int(env) if env else (512 if jnp.dtype(dd).itemsize == 2 else 256)
    return min(cap, _round_up(n, 8))


def _row_spec(bn, w):
    return pl.BlockSpec((bn, w), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _full_spec(a):
    return pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


@jax.custom_vjp
def _ffn_op(x2d, gam, bet, w1, b1, w2, b2):
    n, d = x2d.shape
    f = w1.shape[0]
    dd = _dot_dtype(x2d, w1)
    bn = _bn(n, dd)
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    w1t = w1.T.astype(dd)
    w2t = w2.T.astype(dd)
    vecs = [gam.reshape(1, d).astype(jnp.float32),
            bet.reshape(1, d).astype(jnp.float32)]
    b1r = b1.reshape(1, f).astype(jnp.float32)
    b2r = b2.reshape(1, d).astype(jnp.float32)
    y = pl.pallas_call(
        _ffn_fwd_kernel,
        grid=(np_ // bn,),
        in_specs=[
            _row_spec(bn, d), _full_spec(w1t), _full_spec(b1r),
            _full_spec(w2t), _full_spec(b2r), _full_spec(vecs[0]),
            _full_spec(vecs[1]),
        ],
        out_specs=_row_spec(bn, d),
        out_shape=jax.ShapeDtypeStruct((np_, d), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w1t, b1r, w2t, b2r, *vecs)
    return y[:n]


def _ffn_op_fwd(x2d, gam, bet, w1, b1, w2, b2):
    return _ffn_op(x2d, gam, bet, w1, b1, w2, b2), (
        x2d, gam, bet, w1, b1, w2, b2,
    )


def _ffn_op_bwd(res, g):
    x2d, gam, bet, w1, b1, w2, b2 = res
    n, d = x2d.shape
    f = w1.shape[0]
    dd = _dot_dtype(x2d, w1)
    bn = _bn(n, dd)
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    gp = jnp.pad(g, ((0, np_ - n), (0, 0)))
    w1t = w1.T.astype(dd)
    w1d = w1.astype(dd)
    w2d = w2.astype(dd)
    gamr = gam.reshape(1, d).astype(jnp.float32)
    betr = bet.reshape(1, d).astype(jnp.float32)
    b1r = b1.reshape(1, f).astype(jnp.float32)
    dx, dw1, dw2, db1, db2, dgam, dbet = pl.pallas_call(
        _ffn_bwd_kernel,
        grid=(np_ // bn,),
        in_specs=[
            _row_spec(bn, d), _row_spec(bn, d), _full_spec(w1t),
            _full_spec(w1d), _full_spec(w2d), _full_spec(b1r),
            _full_spec(gamr), _full_spec(betr),
        ],
        out_specs=[
            _row_spec(bn, d),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, d), x2d.dtype),
            jax.ShapeDtypeStruct((f, d), w1.dtype),
            jax.ShapeDtypeStruct((d, f), w2.dtype),
            jax.ShapeDtypeStruct((1, f), b1.dtype),
            jax.ShapeDtypeStruct((1, d), b2.dtype),
            jax.ShapeDtypeStruct((1, d), gam.dtype),
            jax.ShapeDtypeStruct((1, d), bet.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((f, d), jnp.float32),
            pltpu.VMEM((d, f), jnp.float32),
            pltpu.VMEM((1, f), jnp.float32),
            pltpu.VMEM((3, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, gp, w1t, w1d, w2d, b1r, gamr, betr)
    return (dx[:n], dgam.reshape(d), dbet.reshape(d), dw1, db1.reshape(f),
            dw2, db2.reshape(d))


_ffn_op.defvjp(_ffn_op_fwd, _ffn_op_bwd)


def ffn_pre_ln(x, gamma, beta, w1, b1, w2, b2):
    """Dispatched fused FF chain; ``None`` when the kernel should not run.

    Opt-in (``KANVIT_FF=1`` — measured negative end-to-end, see module
    docstring). When opted in: engages under forced Pallas at any shape,
    else on TPU at N >= 32768 with MXU-aligned widths (D and F multiples
    of 128 — ViT-S is 384/1536).
    """
    if os.environ.get("KANVIT_FF", "0") != "1":
        return None
    d = x.shape[-1]
    f = w1.shape[0]
    x2d = x.reshape(-1, d)
    if dispatch.get_impl() != "pallas":
        if not dispatch.use_pallas():
            return None
        if x2d.shape[0] < 32768 or d % 128 or f % 128:
            return None
    y = _ffn_op(x2d, gamma, beta, w1, b1, w2, b2)
    return y.reshape(x.shape)
