"""Fused W8A8 int8 matmul with in-register quantize/dequantize.

The XLA int8 serving path (``kanvit.ops.quant.qdot``) wins its MXU dots
(v5e int8 runs 394.7 TOPs vs 197.4 bf16 TFLOPs; 1.26-1.88x measured at
ViT-B shapes, ``benchmarks/int8_matmul_probe.json``) but loses the glue:
the f32->int8 convert of the activations materializes in HBM as its own
pass, the per-tensor dynamic scale is a global max-reduce barrier, and the
int32->f32 dequantize is another full-tensor pass. Static calibration
removes the barrier but not the passes — bf16 still won 3 of 4 end-to-end
serving cells in round 5 (``benchmarks/int8_static_probe.json``).

This kernel removes the passes instead of the barrier. With the
contraction dim K resident per block, activation scales can be PER ROW
(token): a row max needs no cross-block reduction, so quantization happens
in-register on the VMEM-resident block — HBM sees exactly one read of x
(bf16/f32), one read of w, and one write of y, the same traffic as the
bf16 matmul it replaces, while the dot itself runs at the int8 MXU rate.
The weight is quantized per output channel in-register too (serving
re-quantizes per call either way — doing it in-kernel just stops the int8
copy from round-tripping HBM), and the bias add rides the epilogue.

Per-row activation scales are also strictly finer-grained than the
per-tensor scale the XLA path uses, so this path needs no calibration and
is MORE accurate than both existing modes.

MEASURED NEGATIVE on v5e (round 5) — opt-in only. With the weight
pre-quantized in XLA and the whole int8 weight VMEM-resident (x read
exactly once), the kernel reaches bf16 parity on the isolated ViT-B FF1
(1.93 vs 1.99 ms at batch 256) but still loses to the XLA int8-static
path (1.29 ms): Mosaic lowers ``dot_general(int8, int8, preferred=int32)``
at ~98 TOPs where XLA's int8 dot runs ~174 TOPs at the identical shape
and block geometry (``benchmarks/mosaic_int8_rate_probe.json`` — the
pallas-bf16 control at the same geometry hits 75 TOPs, so int8 IS
double-pumped in Mosaic, just far off XLA's schedule). The ~1.8x dot-rate
deficit exceeds every HBM pass the fusion removes
(``benchmarks/int8_kernel_probe.json``). Revisit only if a Mosaic release
closes the int8 dot-rate gap.

Forward-only by design: this backs the serving path
(``kanvit.infer.Predictor(quant="int8")``), which never differentiates.
Ground truth: ``kanvit.ops.quant.qdot_rowwise`` (exact-value parity in
``tests/test_quant.py`` — the int32 accumulation is order-exact, so the
kernel and the twin agree to f32 rounding of the epilogue).

Replaces the reference's ``nn.Linear`` compute (e.g. the FF pair,
``/root/reference/model.py:25-30``) at serving time; the reference has no
quantized or inference path at all (train-only, ``train.py:58-84``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kanvit.kernels.fused_basis import _round_up
from kanvit.ops import dispatch

_EPS = 1e-12
# On the real chip the MXU prefers big row blocks; int8 operands keep the
# VMEM live set small (x bf16 (bn,K) + xq (bn,K) int8 + w panel). Tests
# override to force multi-block grids at tiny shapes.
_BN = int(os.environ.get("KANVIT_INT8_BN", "256"))
_BO = int(os.environ.get("KANVIT_INT8_BO", "512"))
# When the int8 weight fits under this budget, keep ALL of it VMEM-resident
# (bo = out, single inner grid step): x is then read exactly once instead
# of once per output panel. 8 MB covers every ViT-B/L projection (ViT-B FF
# 768x3072 = 2.4 MB, ViT-L 1024x4096 = 4.2 MB) while leaving room for the
# (bn, out) int32 accumulator. The mosaic_int8_rate probe showed the
# (i, j)-blocked grid pays ~6x redundant x reads at ViT-B FF shapes.
_W_RESIDENT_BYTES = int(
    os.environ.get("KANVIT_INT8_WRES", str(8 * 1024 * 1024))
)


def _quant_rows(a32):
    """Symmetric int8 per-row quantization of an f32 block (rows = axis 0).
    Must mirror ``kanvit.ops.quant._quantize(axis=-1)`` op for op."""
    amax = jnp.max(jnp.abs(a32), axis=1, keepdims=True)
    s = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(a32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _int8_kernel(x_ref, wtq_ref, sw_ref, b_ref, y_ref, xq_s, sx_s):
    j = pl.program_id(1)

    # Quantize the x row block once per row-block visit (j is the inner
    # grid dim; the block is identical across j) — the scale panel is
    # stored lane-broadcast because a (bn, 1) f32 VMEM scratch is not a
    # legal lane tile. The weight arrives pre-quantized: quantizing it
    # in-kernel re-pays the full (K, out) VPU pass once per ROW block
    # (50x redundant at ViT-B batch 64 — measured 1.83 vs 0.97 ms against
    # the XLA static path before this was hoisted).
    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        q, s = _quant_rows(xf)
        xq_s[:] = q
        sx_s[:] = jnp.broadcast_to(s, sx_s.shape)

    acc = jax.lax.dot_general(
        xq_s[:], wtq_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx_s[:, 0:1] * sw_ref[:] + b_ref[:]
    y_ref[:] = y.astype(y_ref.dtype)


def _int8_op(x2d, w, bias_row):
    n, k = x2d.shape
    out = w.shape[0]
    bn = min(_BN, _round_up(n, 32))
    if k * out <= _W_RESIDENT_BYTES:
        bo = out  # whole int8 weight resident; x read exactly once
    else:
        bo = min(_BO, out)
        while out % bo:  # out is a multiple of 128, so this terminates
            bo -= 128
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    # Weight quantization is N-independent — hoist it to XLA (one cheap
    # (out, K) pass per serving call; also halves weight HBM reads, the
    # kernel streams int8 panels). Must mirror quant._quantize(axis=-1).
    w32 = w.astype(jnp.float32)
    wmax = jnp.max(jnp.abs(w32), axis=-1, keepdims=True)
    sw = jnp.maximum(wmax, _EPS) / 127.0
    wtq = jnp.clip(jnp.round(w32 / sw), -127, 127).astype(jnp.int8).T
    sw_row = sw.reshape(1, out)
    y = pl.pallas_call(
        _int8_kernel,
        grid=(np_ // bn, out // bo),
        in_specs=[
            pl.BlockSpec((bn, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bo), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bo), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bo), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, bo), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, out), x2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((bn, k), jnp.int8),
            pltpu.VMEM((bn, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, wtq, sw_row, bias_row)
    return y[:n]


def _jnp_twin(x2d, w, bias_row):
    from kanvit.ops import quant

    return quant.qdot_rowwise(x2d, w, bias=bias_row)


def int8_linear(x, w, bias=None):
    """Dispatched fused W8A8 linear: ``x @ w.T (+ bias)`` with per-row
    activation quantization in-register. Returns ``None`` when the kernel
    should not run (caller falls back to the XLA ``qdot`` path).

    Eligibility: measured negative end-to-end (see module docstring), so
    under "auto" dispatch it engages only with ``KANVIT_INT8_KERNEL=1``
    set, on TPU, at N >= 1024, with K and out multiples of 128 (MXU/lane
    tiling — the classifier head's out=10/100 falls back either way).
    Forced-pallas dispatch (tests, interpret-mode parity) always runs it;
    ``KANVIT_INT8_KERNEL=0`` hatches it off entirely.
    """
    mode = os.environ.get("KANVIT_INT8_KERNEL", "auto")
    if mode == "0":
        return None
    k = x.shape[-1]
    out = w.shape[0]
    if k % 128 or out % 128:
        return None
    x2 = x.reshape(-1, k)
    if dispatch.get_impl() != "pallas":
        if mode != "1":
            return None  # measured negative: Mosaic int8 dot-rate deficit
        if not dispatch.use_pallas():
            return None
        if x2.shape[0] < 1024:
            return None
    from kanvit.parallel import runtime

    brow = (jnp.zeros((1, out), jnp.float32) if bias is None
            else bias.reshape(1, out).astype(jnp.float32))
    y = runtime.kan_op(_int8_op, _jnp_twin, x2, w, brow)
    return y.reshape(*x.shape[:-1], out)
