"""Pallas TPU flash-attention: fwd + hand-derived custom VJP.

TPU-native equivalent of the reference's Python-tiled
``FlashAttentionFunction`` (reference ``utils.py:134-295``, FlashAttention-2
Algorithms 1 & 2). The reference loops over tensor *chunks* in Python because
it has no kernel language; here the same online-softmax tiling runs as a real
kernel: grid ``(batch*heads, q_blocks, k_blocks)`` with the k axis innermost,
a float32 accumulator + running (max, sum) in VMEM scratch, and the
``q_bucket_size``/``k_bucket_size`` knobs becoming block sizes.

Backward follows reference Algorithm 2 (``utils.py:229-295``): recompute
scores per tile, ``p = exp(s - lse)``, ``ds = p * scale * (dp - delta)`` with
``delta = rowsum(do * o)`` precomputed outside the kernel; split into a
dq-kernel (accumulating over k blocks) and a dk/dv-kernel (accumulating over
q blocks) since TPU has no cross-program atomics.

Numerics: softmax math (max/exp/sum, accumulators, (m, l) residuals) is
always float32; the MXU dots keep the *input* dtype for their operands with
f32 accumulation — with bf16 inputs that is the MXU's native mode (an
f32xf32 dot costs ~3x bf16 passes on v5e), and the probability/score-grad
tiles are cast to bf16 only at the dot boundary, as in standard TPU flash
attention. Block row sums are clamped at ``EPSILON = 1e-10`` exactly like
the reference (``utils.py:10,206``).

Dispatch: on non-TPU backends falls back to the pure-JAX
``flash_attention_reference`` (identical semantics, autodiff backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kanvit.ops import dispatch
from kanvit.ops.attention import flash_attention_reference

EPSILON = 1e-10
NEG_INF = float(jnp.finfo(jnp.float32).min)
LANE = 128
# Below this sequence length the materialized score tensor is tile-sized
# and XLA's fused attention is faster than per-block kernel launches
# (measured: the kernel wins ~6x at seq 2048 but pure launch overhead at
# seq 17-50); "auto" only engages the kernel for longer sequences.
# KANVIT_ATTN_MIN_SEQ overrides for end-to-end A/Bs (read per trace).
MIN_PALLAS_SEQ = 1024


def _min_pallas_seq() -> int:
    import os

    return int(os.environ.get("KANVIT_ATTN_MIN_SEQ", MIN_PALLAS_SEQ))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_ref, l_ref, acc, m_scr, l_scr,
                *, scale, tk, bq, bk, causal, qk_len_diff):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    # Dtype policy: softmax math stays f32; the MXU dots keep bf16 operands
    # with f32 accumulation when inputs are bf16 (an f32xf32 dot costs ~3x
    # bf16 MXU passes on v5e).
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bq, bk) f32

    kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    key_valid = (kpos < tk) & (mask_ref[0] > 0.5)
    s = jnp.where(key_valid, s, NEG_INF)
    if causal:
        i = pl.program_id(1)
        qpos = (
            i * bq
            - qk_len_diff
            + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        )
        s = jnp.where(qpos >= kpos, s, NEG_INF)

    m_prev = m_scr[:, :1]
    block_max = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(block_max, m_prev)
    p = jnp.exp(s - m_new)
    # Parity note: only the *key-padding* mask is re-zeroed after exp —
    # the reference re-zeroes only its col_mask (utils.py:202-203), so rows
    # that are fully causally masked degenerate to uniform weights exactly
    # like the reference does.
    p = jnp.where(key_valid, p, 0.0)
    block_sum = jnp.clip(jnp.sum(p, axis=-1, keepdims=True), EPSILON, None)
    corr = jnp.exp(m_prev - m_new)
    l_new = corr * l_scr[:, :1] + block_sum

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc[:] = acc[:] * corr + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == nk - 1)
    def _finish():
        l = jnp.clip(l_scr[:, :1], EPSILON, None)
        o_ref[0] = (acc[:] / l).astype(o_ref.dtype)
        m_ref[0] = m_scr[:, :1].reshape(1, -1)
        l_ref[0] = l.reshape(1, -1)


def _fwd_pallas(q, k, v, mask, h, causal, bq, bk, scale, tk, qk_len_diff):
    """q: (BH, TQp, Dp); k, v: (BH, TKp, Dp); mask: (B, 1, TKp) f32.
    Returns (o, m, l)."""
    bh, tqp, dp = q.shape
    tkp = k.shape[1]
    nq, nk = tqp // bq, tkp // bk
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel,
            scale=scale,
            tk=tk,
            bq=bq,
            bk=bk,
            causal=causal,
            qk_len_diff=qk_len_diff,
        ),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda b, i, j, _h=h: (b // _h, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tqp, dp), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, tqp), jnp.float32),
            jax.ShapeDtypeStruct((bh, 1, tqp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, dp), jnp.float32),
            pltpu.VMEM((bq, LANE), jnp.float32),
            pltpu.VMEM((bq, LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=dispatch.interpret_mode(),
    )(q, k, v, mask)


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, delta_ref, mask_ref,
                   dq_ref, acc, *, scale, tk, bq, bk, causal, qk_len_diff):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    m = m_ref[0, 0][:, None]
    linv = 1.0 / l_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]

    # Same dtype policy as the forward: f32 softmax math, input-dtype MXU
    # operands (bf16 dots with f32 accumulation when inputs are bf16).
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    key_valid = (kpos < tk) & (mask_ref[0] > 0.5)
    if causal:
        i = pl.program_id(1)
        qpos = i * bq - qk_len_diff + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        s = jnp.where(qpos >= kpos, s, NEG_INF)
    # p = exp(s - m) / l: splitting (m, l) instead of the reference's fused
    # lse (utils.py:277) avoids float absorption when m is near -inf, so
    # fully-masked rows get correctly normalized uniform weights.
    p = jnp.where(key_valid, jnp.exp(s - m) * linv, 0.0)

    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * scale * (dp - delta)
    if causal:
        # Masked scores are constants in the fwd graph, so their score-grad
        # is exactly zero (matters only for fully-masked rows, where p is a
        # nonzero uniform constant).
        ds = jnp.where(qpos >= kpos, ds, 0.0)
    acc[:] += jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nk - 1)
    def _finish():
        dq_ref[0] = acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, delta_ref, mask_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc,
                    *, scale, tk, bq, bk, causal, qk_len_diff):
    i = pl.program_id(2)  # q-block index (innermost)
    nq = pl.num_programs(2)
    j = pl.program_id(1)  # k-block index

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    m = m_ref[0, 0][:, None]
    linv = 1.0 / l_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    key_valid = (kpos < tk) & (mask_ref[0] > 0.5)
    if causal:
        qpos = i * bq - qk_len_diff + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        s = jnp.where(qpos >= kpos, s, NEG_INF)
    p = jnp.where(key_valid, jnp.exp(s - m) * linv, 0.0)

    dv_acc[:] += jax.lax.dot_general(
        p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * scale * (dp - delta)
    if causal:
        ds = jnp.where(qpos >= kpos, ds, 0.0)
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == nq - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Padding / shape plumbing + custom VJP
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Small-sequence fully-fused path (single score tile per (batch, head))
# ---------------------------------------------------------------------------
#
# At T <= SMALL_MAX_T the whole (Tp, Tp) score tile fits VMEM, so the
# blocked online-softmax machinery is pure overhead: the forward needs no
# (m, l) running state, and the backward produces dq, dk AND dv from ONE
# score recompute in a single program — the general path pays two (split
# dq / dk-dv kernels; TPU has no cross-program atomics) plus a separate
# delta pass. One program per *batch item* loops over its heads so
# per-program work amortizes the per-grid-step overhead. Engaged only when
# the caller's bucket sizes would already cover the sequence in one tile
# (so explicit small buckets still exercise the general blocked kernels).

SMALL_MAX_T = 512


def _use_small(tq, tk, d, h, q_block, k_block, itemsize):
    tp = _round_up(tq, LANE)
    dp = _round_up(d, LANE)
    vmem = (
        2 * (5 + 3) * h * tp * dp * itemsize   # double-buffered io blocks
        + 4 * tp * tp * 4                      # s/p/dp/ds f32 transients
    )
    return (
        tq == tk
        and tp <= SMALL_MAX_T
        and tp <= q_block
        and tp <= k_block
        and vmem <= 10 * 1024 * 1024
    )


def _small_bias(mask_row, tk, causal, tp):
    """Head-invariant ADDITIVE score masks, built once per program (the
    per-element compare+where chain the first version ran per head was the
    kernel's VPU hot spot): a (1, tp) key bias (0 attend / -inf for padded
    or user-masked keys — ``exp`` then zeroes those probabilities exactly)
    and, for causal, a (tp, tp) additive triangle."""
    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
    kbias = jnp.where((kpos < tk) & (mask_row > 0.5), 0.0, NEG_INF)
    cbias = None
    if causal:
        qpos2 = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 0)
        kpos2 = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
        cbias = jnp.where(qpos2 >= kpos2, 0.0, NEG_INF)
    return kbias, cbias


def _small_probs(qs, k, kbias, cbias):
    """Unnormalized probabilities + clamped row sums for one (Tp, Tp) tile.
    ``qs`` carries the softmax scale (folded into q: a (Tp, d) mul instead
    of a (Tp, Tp) one). The row max is clamped to keep fully-masked rows
    (all scores -inf) NaN-free: they get p = 0, l = EPSILON, output 0."""
    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + kbias
    if cbias is not None:
        s = s + cbias
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e30)
    p = jnp.exp(s - m)
    l = jnp.clip(jnp.sum(p, axis=-1, keepdims=True), EPSILON, None)
    return p, l


def _small_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                      *, scale, tk, causal, h, tp):
    kbias, cbias = _small_bias(mask_ref[0], tk, causal, tp)
    for hi in range(h):
        qs = q_ref[hi] * jnp.asarray(scale, q_ref.dtype)
        p, l = _small_probs(qs, k_ref[hi], kbias, cbias)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[hi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[hi] = (pv * (1.0 / l)).astype(o_ref.dtype)


def _small_bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, mask_ref,
                      dq_ref, dk_ref, dv_ref, *, scale, tk, causal, h, tp):
    kbias, cbias = _small_bias(mask_ref[0], tk, causal, tp)
    for hi in range(h):
        k, v = k_ref[hi], v_ref[hi]
        do, o = do_ref[hi], o_ref[hi]
        qs = q_ref[hi] * jnp.asarray(scale, q_ref.dtype)
        p, l = _small_probs(qs, k, kbias, cbias)
        pn = p * (1.0 / l)  # normalized probabilities, f32
        dv_ref[hi] = jax.lax.dot_general(
            pn.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        delta = jnp.sum(
            do.astype(jnp.float32) * o.astype(jnp.float32),
            axis=-1, keepdims=True,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        # Masked/causal-invalid columns have pn = 0, so ds is already 0
        # there — no re-zeroing pass needed.
        dsc = (pn * (dp - delta)).astype(k.dtype)
        dq_ref[hi] = (
            jax.lax.dot_general(
                dsc, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        ).astype(dq_ref.dtype)
        # dk = scale * ds^T @ q: the pre-scaled qs carries the factor.
        dk_ref[hi] = jax.lax.dot_general(
            dsc, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def _small_dp(d):
    # Keep the head dim unpadded when sublane-aligned: the block minor dim
    # may equal the array dim, and at d=64 padding to 128 lanes would
    # double every tensor's HBM traffic — the dominant cost at short T.
    return d if d % 8 == 0 else _round_up(d, LANE)


def _small_fwd_impl(q, k, v, mask, causal):
    b, h, tq, d = q.shape
    tp, dp = _round_up(tq, LANE), _small_dp(d)
    qf = _pad3(q.reshape(b * h, tq, d), tp, dp)
    kf = _pad3(k.reshape(b * h, tq, d), tp, dp)
    vf = _pad3(v.reshape(b * h, tq, d), tp, dp)
    maskf = _mask3(mask, b, tq, tp)
    blk = lambda: pl.BlockSpec(
        (h, tp, dp), lambda bb: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    o = pl.pallas_call(
        functools.partial(
            _small_fwd_kernel, scale=d**-0.5, tk=tq, causal=causal, h=h, tp=tp
        ),
        grid=(b,),
        in_specs=[
            blk(), blk(), blk(),
            pl.BlockSpec((1, 1, tp), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=dispatch.interpret_mode(),
    )(qf, kf, vf, maskf)
    return o[:, :tq, :d].reshape(b, h, tq, d)


def _small_bwd_impl(q, k, v, mask, o, do, causal):
    b, h, tq, d = q.shape
    tp, dp = _round_up(tq, LANE), _small_dp(d)
    qf = _pad3(q.reshape(b * h, tq, d), tp, dp)
    kf = _pad3(k.reshape(b * h, tq, d), tp, dp)
    vf = _pad3(v.reshape(b * h, tq, d), tp, dp)
    dof = _pad3(do.reshape(b * h, tq, d), tp, dp)
    of = _pad3(o.reshape(b * h, tq, d), tp, dp)
    maskf = _mask3(mask, b, tq, tp)
    blk = lambda: pl.BlockSpec(
        (h, tp, dp), lambda bb: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _small_bwd_kernel, scale=d**-0.5, tk=tq, causal=causal, h=h, tp=tp
        ),
        grid=(b,),
        in_specs=[
            blk(), blk(), blk(), blk(), blk(),
            pl.BlockSpec((1, 1, tp), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[blk(), blk(), blk()],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tp, dp), q.dtype),
            jax.ShapeDtypeStruct((b * h, tp, dp), k.dtype),
            jax.ShapeDtypeStruct((b * h, tp, dp), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=dispatch.interpret_mode(),
    )(qf, kf, vf, dof, of, maskf)
    dq = dq[:, :tq, :d].reshape(b, h, tq, d)
    dk = dk[:, :tq, :d].reshape(b, h, tq, d)
    dv = dv[:, :tq, :d].reshape(b, h, tq, d)
    dmask = None if mask is None else jnp.zeros_like(mask, dtype=jnp.float32)
    return dq, dk, dv, dmask


# --- lanes-layout small path (heads live in the lane dim) -------------------
#
# Consumes q/k/v as (B, T, H*dh) with head h at lanes [h*dh, (h+1)*dh) — the
# layout the slot-grouped qkv kernels emit and the head-concat output layout
# the rest of the block consumes — so an MSA block runs with ZERO head
# split/merge relayouts. XLA cannot fuse the (B,T,H,dh)->(B,H,T,dh)
# transposes into the attention when a custom call sits on either side, and
# even its own fused attention leaves them as physical HBM passes (measured
# ~4.7 ms/block of glue at ViT-S, tools/tpu_probe_qkv_parts.py); here the
# per-head views are in-kernel static lane slices (a register relayout per
# vreg, no HBM traffic). Same math as the (B, H, T, dh) single-tile path.

def _lanes_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                      *, scale, tk, causal, h, tp, dh, nb):
    for bi in range(nb):
        kbias, cbias = _small_bias(mask_ref[bi], tk, causal, tp)
        qall, kall, vall = q_ref[bi], k_ref[bi], v_ref[bi]
        for hi in range(h):
            sl = slice(hi * dh, (hi + 1) * dh)
            qs = qall[:, sl] * jnp.asarray(scale, qall.dtype)
            p, l = _small_probs(qs, kall[:, sl], kbias, cbias)
            pv = jax.lax.dot_general(
                p.astype(vall.dtype), vall[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[bi, :, sl] = (pv * (1.0 / l)).astype(o_ref.dtype)


def _lanes_bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, mask_ref,
                      dq_ref, dk_ref, dv_ref,
                      *, scale, tk, causal, h, tp, dh, nb):
    for bi in range(nb):
        kbias, cbias = _small_bias(mask_ref[bi], tk, causal, tp)
        qall, kall, vall = q_ref[bi], k_ref[bi], v_ref[bi]
        doall, oall = do_ref[bi], o_ref[bi]
        for hi in range(h):
            sl = slice(hi * dh, (hi + 1) * dh)
            k, v = kall[:, sl], vall[:, sl]
            do, o = doall[:, sl], oall[:, sl]
            qs = qall[:, sl] * jnp.asarray(scale, qall.dtype)
            p, l = _small_probs(qs, k, kbias, cbias)
            pn = p * (1.0 / l)
            dv_ref[bi, :, sl] = jax.lax.dot_general(
                pn.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)
            delta = jnp.sum(
                do.astype(jnp.float32) * o.astype(jnp.float32),
                axis=-1, keepdims=True,
            )
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dsc = (pn * (dp - delta)).astype(k.dtype)
            dq_ref[bi, :, sl] = (
                jax.lax.dot_general(
                    dsc, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
            ).astype(dq_ref.dtype)
            dk_ref[bi, :, sl] = jax.lax.dot_general(
                dsc, qs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dk_ref.dtype)


def _lanes_ok(t, tk, dm, h, itemsize):
    if t != tk or dm % h:
        return False
    dh = dm // h
    tp = _round_up(t, 8)
    vmem = 2 * 8 * tp * _round_up(dm, LANE) * itemsize + 4 * tp * tp * 4
    return dh % 8 == 0 and tp <= SMALL_MAX_T and vmem <= 10 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_lanes(q, k, v, mask, h, causal):
    return _lanes_fwd_impl(q, k, v, mask, h, causal)


# No T padding anywhere on this path: a block dim EQUAL to the array dim is
# legal for any size (Mosaic masks the ragged registers internally), so the
# kernels run T=197 directly — padding to a lane multiple would cost a full
# HBM pass per operand (4 fwd + 5 bwd) to buy nothing.

def _lanes_nb(b, t, dm, itemsize, n_arrays):
    """Batch items per program. MEASURED NEGATIVE at the ViT-S shape
    (nb=2 fwd: 2.78 vs 2.35 ms — the kernel is VPU-bound on exp, ~27
    cycles/elt, and fatter programs only add VMEM pressure), so this
    stays 1; the kernels keep the nb parameter for future shapes."""
    return 1


def _lanes_fwd_impl(q, k, v, mask, h, causal):
    b, t, dm = q.shape
    nb = _lanes_nb(b, t, dm, q.dtype.itemsize, 4)
    maskf = _mask3(mask, b, t, t)
    blk = lambda: pl.BlockSpec(
        (nb, t, dm), lambda bb: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _lanes_fwd_kernel, scale=(dm // h) ** -0.5, tk=t, causal=causal,
            h=h, tp=t, dh=dm // h, nb=nb,
        ),
        grid=(b // nb,),
        in_specs=[
            blk(), blk(), blk(),
            pl.BlockSpec((nb, 1, t), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((b, t, dm), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=dispatch.interpret_mode(),
    )(q, k, v, maskf)


def _lanes_fwd(q, k, v, mask, h, causal):
    o = _lanes_fwd_impl(q, k, v, mask, h, causal)
    return o, (q, k, v, mask, o)


def _lanes_bwd(h, causal, res, do):
    q, k, v, mask, o = res
    b, t, dm = q.shape
    nb = _lanes_nb(b, t, dm, q.dtype.itemsize, 8)
    maskf = _mask3(mask, b, t, t)
    blk = lambda: pl.BlockSpec(
        (nb, t, dm), lambda bb: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _lanes_bwd_kernel, scale=(dm // h) ** -0.5, tk=t, causal=causal,
            h=h, tp=t, dh=dm // h, nb=nb,
        ),
        grid=(b // nb,),
        in_specs=[
            blk(), blk(), blk(), blk(), blk(),
            pl.BlockSpec((nb, 1, t), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[blk(), blk(), blk()],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, dm), q.dtype),
            jax.ShapeDtypeStruct((b, t, dm), k.dtype),
            jax.ShapeDtypeStruct((b, t, dm), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=dispatch.interpret_mode(),
    )(q, k, v, do, o, maskf)
    dmask = None if mask is None else jnp.zeros_like(mask, dtype=jnp.float32)
    return dq, dk, dv, dmask


_flash_lanes.defvjp(_lanes_fwd, _lanes_bwd)


def lanes_applicable(t: int, tk: int, dm: int, n_heads: int,
                     itemsize: int) -> bool:
    """True when ``flash_attention_lanes`` would engage for this shape —
    callers that must CHOOSE a qkv layout before computing it (e.g. the
    block-diagonal Linear qkv in MSA) test this predicate first."""
    import os

    if os.environ.get("KANVIT_ATTN_LANES", "1") != "1":
        return False
    if not dispatch.use_pallas():
        return False
    return _lanes_ok(t, tk, dm, n_heads, itemsize)


def flash_attention_lanes(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_heads: int,
    causal: bool = False,
    mask: jnp.ndarray | None = None,
    q_block: int | None = None,
    k_block: int | None = None,
) -> jnp.ndarray | None:
    """Attention over head-concatenated ``(B, T, H*dh)`` tensors.

    Returns the output in the same layout, or ``None`` when the
    lanes-layout single-tile path does not apply (caller falls back to the
    ``(B, H, T, dh)`` entry). Engages below ``MIN_PALLAS_SEQ`` too: its win
    is the removed relayouts, not the attention math itself.
    ``KANVIT_ATTN_LANES=0`` is the A/B hatch."""
    import os

    if os.environ.get("KANVIT_ATTN_LANES", "1") != "1":
        return None
    if not dispatch.use_pallas():
        return None
    from kanvit.parallel import runtime

    mesh = runtime.active_mesh()
    b, t, dm = q.shape
    nm = mesh.shape.get("model", 1) if mesh is not None else 1
    # Applicability is judged at the per-shard shape under an active mesh —
    # the kernel launches on local heads inside shard_map (runtime module
    # docstring: a bare pallas_call never sees mesh-sharded operands).
    if n_heads % nm or not _lanes_ok(
        t, k.shape[1], dm // nm, n_heads // nm, q.dtype.itemsize
    ):
        return None
    # Mirror _use_small's bucket guard: explicit small buckets mean the
    # caller wants the general blocked kernels exercised.
    tp = _round_up(t, LANE)
    if (q_block is not None and tp > q_block) or (
        k_block is not None and tp > k_block
    ):
        return None
    if mesh is None:
        return _flash_lanes(q, k, v, mask, n_heads, causal)
    nd = mesh.shape.get("data", 1)
    if b % nd:
        return None
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    hl = n_heads // nm
    marrs = () if mask is None else (mask,)

    def body(ql, kl, vl, *m):
        with runtime.local_region():
            return _flash_lanes(ql, kl, vl, m[0] if m else None, hl, causal)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data", None, "model"),) * 3 + (P("data"),) * len(marrs),
        out_specs=P("data", None, "model"),
        check_vma=False,
    )(q, k, v, *marrs)


def _plan(tq, tk, d, q_block, k_block):
    bq = min(_round_up(q_block, LANE), _round_up(tq, LANE))
    bk = min(_round_up(k_block, LANE), _round_up(tk, LANE))
    return (
        bq,
        bk,
        _round_up(tq, bq),
        _round_up(tk, bk),
        _round_up(d, LANE),
    )


def _pad3(x, t_to, d_to):
    return jnp.pad(x, ((0, 0), (0, t_to - x.shape[1]), (0, d_to - x.shape[2])))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, mask, causal, q_block, k_block):
    b, h, tq, d = q.shape
    if _use_small(tq, k.shape[2], d, h, q_block, k_block, q.dtype.itemsize):
        return _small_fwd_impl(q, k, v, mask, causal)
    o, _, _, _ = _flash_fwd_impl(q, k, v, mask, causal, q_block, k_block)
    return o


def _mask3(mask, b, tk, tkp):
    """(B, Tk) bool/float -> (B, 1, TKp) f32 (1.0 = attend)."""
    if mask is None:
        return jnp.ones((b, 1, tkp), jnp.float32)
    m = mask.astype(jnp.float32).reshape(b, 1, tk)
    return jnp.pad(m, ((0, 0), (0, 0), (0, tkp - tk)))


def _flash_fwd_impl(q, k, v, mask, causal, q_block, k_block):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bq, bk, tqp, tkp, dp = _plan(tq, tk, d, q_block, k_block)

    qf = _pad3(q.reshape(b * h, tq, d), tqp, dp)
    kf = _pad3(k.reshape(b * h, tk, d), tkp, dp)
    vf = _pad3(v.reshape(b * h, tk, d), tkp, dp)
    maskf = _mask3(mask, b, tk, tkp)

    o, m, l = _fwd_pallas(
        qf, kf, vf, maskf, h, causal, bq, bk, d**-0.5, tk, max(tk - tq, 0)
    )
    o = o[:, :tq, :d].reshape(b, h, tq, d)
    m = m[:, 0, :tq].reshape(b, h, tq)
    l = l[:, 0, :tq].reshape(b, h, tq)
    lse = jnp.log(l) + m
    return o, lse, m, l


def _flash_fwd(q, k, v, mask, causal, q_block, k_block):
    b, h, tq, d = q.shape
    if _use_small(tq, k.shape[2], d, h, q_block, k_block, q.dtype.itemsize):
        o = _small_fwd_impl(q, k, v, mask, causal)
        return o, (q, k, v, mask, o, None, None)
    o, _, m, l = _flash_fwd_impl(q, k, v, mask, causal, q_block, k_block)
    return o, (q, k, v, mask, o, m, l)


def _flash_bwd(causal, q_block, k_block, res, do):
    q, k, v, mask, o, m, l = res
    if m is None:  # small single-tile path: joint dq/dk/dv kernel
        return _small_bwd_impl(q, k, v, mask, o, do, causal)
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bq, bk, tqp, tkp, dp = _plan(tq, tk, d, q_block, k_block)
    nq, nk = tqp // bq, tkp // bk
    scale = d**-0.5
    qk_len_diff = max(tk - tq, 0)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    qf = _pad3(q.reshape(b * h, tq, d), tqp, dp)
    kf = _pad3(k.reshape(b * h, tk, d), tkp, dp)
    vf = _pad3(v.reshape(b * h, tk, d), tkp, dp)
    dof = _pad3(do.reshape(b * h, tq, d), tqp, dp)
    # Padded q rows: m=0, l=1 -> p = exp(s)/1 (finite), and do=0 there, so
    # they contribute nothing (and never produce inf * 0 = NaN).
    mf = jnp.pad(m.reshape(b * h, 1, tq), ((0, 0), (0, 0), (0, tqp - tq)))
    lf = jnp.pad(
        l.reshape(b * h, 1, tq),
        ((0, 0), (0, 0), (0, tqp - tq)),
        constant_values=1.0,
    )
    deltaf = jnp.pad(delta.reshape(b * h, 1, tq), ((0, 0), (0, 0), (0, tqp - tq)))
    maskf = _mask3(mask, b, tk, tkp)

    bh = b * h
    kw = dict(scale=scale, tk=tk, bq=bq, bk=bk, causal=causal, qk_len_diff=qk_len_diff)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **kw),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda b, i, j, _h=h: (b // _h, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, tqp, dp), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=dispatch.interpret_mode(),
    )(qf, kf, vf, dof, mf, lf, deltaf, maskf)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **kw),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, dp), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda b, j, i, _h=h: (b // _h, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, dp), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tkp, dp), k.dtype),
            jax.ShapeDtypeStruct((bh, tkp, dp), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, dp), jnp.float32),
            pltpu.VMEM((bk, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=dispatch.interpret_mode(),
    )(qf, kf, vf, dof, mf, lf, deltaf, maskf)

    dq = dq[:, :tq, :d].reshape(b, h, tq, d)
    dk = dk[:, :tk, :d].reshape(b, h, tk, d)
    dv = dv[:, :tk, :d].reshape(b, h, tk, d)
    dmask = None if mask is None else jnp.zeros_like(mask, dtype=jnp.float32)
    return dq, dk, dv, dmask


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    q_block: int = 512,
    k_block: int = 1024,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Flash attention over ``(B, H, T, D)`` tensors.

    Pallas kernel on TPU; pure-JAX blocked reference elsewhere (identical
    online-softmax math, autodiff backward). ``q_block``/``k_block`` mirror
    the reference's ``q_bucket_size``/``k_bucket_size`` knobs
    (reference ``attention.py:21-22``); ``mask`` is the reference's optional
    ``(B, Tk)`` key-padding mask (True = attend, ``utils.py:154-164``).
    """
    tq, tk = q.shape[2], k.shape[2]
    if dispatch.use_pallas() and (
        max(tq, tk) >= _min_pallas_seq() or dispatch.get_impl() == "pallas"
    ):
        from kanvit.parallel import runtime

        mesh = runtime.active_mesh()
        if mesh is None:
            return _flash(q, k, v, mask, causal, q_block, k_block)
        # Active multi-device mesh: launch the kernel per shard (batch over
        # data, heads over model) inside shard_map — the SPMD partitioner
        # cannot shard the custom call itself. Falls through to the plain
        # HLO compositions below when the shape cannot partition.
        b, h = q.shape[0], q.shape[1]
        nd = mesh.shape.get("data", 1)
        nm = mesh.shape.get("model", 1)
        if b % nd == 0 and h % nm == 0:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            marrs = () if mask is None else (mask,)

            def body(ql, kl, vl, *m):
                with runtime.local_region():
                    return _flash(
                        ql, kl, vl, m[0] if m else None, causal,
                        q_block, k_block,
                    )

            return shard_map(
                body,
                mesh=mesh,
                in_specs=(P("data", "model"),) * 3 + (P("data"),) * len(marrs),
                out_specs=P("data", "model"),
                check_vma=False,
            )(q, k, v, *marrs)
    if mask is None and (not causal or tq == tk):
        # Short sequences: plain fused softmax attention — numerically the
        # same online-softmax result, none of the blocking machinery.
        from kanvit.ops.attention import multi_head_attention

        return multi_head_attention(q, k, v, causal)
    return flash_attention_reference(q, k, v, causal, q_block, k_block, mask)[0]
