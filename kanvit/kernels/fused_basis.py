"""Fused KAN basis-expansion + contraction Pallas kernels.

Every KAN variant computes ``y[n,o] = sum_{i,g} basis_g(x)[n,i] * W[g,i,o]``
(SURVEY §3.4): a VPU-friendly elementwise basis expansion contracted against
a weight tensor. Left to XLA, the ``(N, in*grid)`` basis tensor round-trips
through HBM (with ``in*grid`` up to ~10k for the patch embedders it is the
reference's memory hot spot — e.g. ``models/nfkan.py:44-48`` materializes an
implicit ``(N, out, in, grid)`` product). These kernels expand each
harmonic/knot slice ``basis_g(x) (bn, in)`` into a flat ``(bn, in*grid)``
VMEM scratch (static per-g unroll — grid sizes are 4–56 — writing 2-D
slices, since Mosaic cannot lower minor-dim reshapes) and contract it with
one large MXU matmul: one HBM pass over ``x`` and ``y``, the basis never
touches HBM.

One kernel template serves all five families; each family contributes a
``Family`` with ``setup(x, extras) -> ctx`` plus per-g ``basis(ctx, gi)`` and
``basis_grad(ctx, gi)`` built from the closed-form derivatives in
``kanvit.ops.kan_bases`` (verified against ``jax.jvp``). The hand-derived
VJP:

  dW[g] = basis_g(x)^T @ gout        (recompute basis in the bwd kernel)
  dx   += (gout @ W[g]^T) * dbasis_g/dx
  (sine only) dfreq — small reduction, fused by XLA outside the kernel
  (freq is trainable in the reference, sinekan.py:65-70)

Weight layout inside the kernels is ``(ng, in, out)``; layer-facing wrappers
transpose from the reference's parameter layouts (cheap, differentiable).

Dispatch policy is measurement-driven (see ``_should_fuse`` and
docs/PERFORMANCE.md): on "auto" only the B-spline family engages the kernel
(HBM-bound, wins at scale, and enables configs whose XLA path OOMs);
``KANVIT_IMPL=pallas`` forces every kernel (tests, escape hatch).

Three kernel tiers by weight size (picked per shape, largest first):
  1. plain — full (F, out) weight resident in VMEM, 1-D row grid;
  2. out-blocked — (F, out_blk) weight slabs, grid (out_blocks, rows) with
     rows innermost (wide embedders, e.g. ViT-S 768->384 where F=6144; bwd
     writes per-slab partial dx summed in one XLA reduction);
  3. XLA fallback — extreme widths where even one slab cannot fit.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kanvit.ops import dispatch
from kanvit.ops import kan_bases as K

# Dispatch policy (measurement-driven, hard-sync A/B on v5e): the trig/RBF
# families are transcendental-bound (VPU) — XLA's fused jnp path sits at the
# roofline and the kernels tie or lose, so "auto" keeps jnp for them. The
# B-spline family is mul/add-only and HBM-bound on its basis-level temps:
# the kernel wins 1.6-2x at large N and, by never materializing the basis,
# runs configs whose jnp path OOMs HBM (ViT-S efficientkan) — "auto" engages
# it above a row threshold. KANVIT_IMPL=pallas forces every kernel.
# VMEM live-set budget for picking the row block. Mosaic keeps the unrolled
# per-g temporaries on its scoped stack, so the working set scales with
# ng * bn * in; v5e scoped VMEM is 16MB. The model below accounts for the
# levels, the basis scratch, the resident weight/dw blocks AND the
# double-buffered streamed io blocks, so the budget can sit close to the
# hardware limit.
_VMEM_BUDGET = 12 * 1024 * 1024

# Scoped-VMEM ceiling for the kb dw kernels (vmem_limit_bytes). Mosaic's
# default scoped limit is 16MB; v5e has 128MB of VMEM. The dw pass is
# step-overhead bound — wider k slabs cut its (k, rows) grid directly —
# so it alone requests a raised limit and sizes slabs against this model
# (everything double-buffered + per-row temps; see _pick_kb).
_DW_VMEM_LIMIT = 112 * 1024 * 1024
_DW_VMEM_BUDGET = 96 * 1024 * 1024

# Scoped-VMEM ceiling for the slot-grouped qkv kernels (None = Mosaic's
# 16M default). Probe knob: tools/tpu_probe_sg_geometry.py sweeps it with
# forced row blocks to find where the sg launches sit vs their roofline.
_SG_VMEM_LIMIT = None

# RBF+LN (fast) sg launch geometry — round-5 measured finding
# (tools/tpu_probe_fast_geometry.py -> benchmarks/fast_geometry_probe.json):
# 4x row blocks under a raised 64M scoped-VMEM limit cut the ViT-S fast
# MSA fwd+bwd 14.45 -> 13.82 ms/block (fewer grid steps; the 12M-model
# pick was grid-step-overhead bound). x8/100M regresses (15.06).
# KANVIT_FAST_GEOM=0 restores the conservative pick for A/Bs.
_RBF_SG_BN_SCALE = 4 if os.environ.get("KANVIT_FAST_GEOM", "1") == "1" else 1
_RBF_SG_VMEM_LIMIT = 64 * 1024 * 1024 if _RBF_SG_BN_SCALE > 1 else None


def _pick_row_block(nin: int, out: int, ng: int, n_temps: int,
                    w_bytes: int = 4, with_dw: bool = True,
                    scr_bytes: int = 4, stream_bytes: int = 0,
                    per_g: bool = True, pack: int = 1,
                    slot_w: bool = False) -> int:
    """Largest row block (multiple of 8, <=512) whose unrolled live set
    (~n_temps arrays of (bn, in) f32 per g step, plus the basis scratch row
    and the resident weight/dw blocks) fits the budget. The cap matters: at
    narrow widths (the d=64 per-head projections) a small block makes the
    kernel grid-step-overhead bound — thousands of ~50-MFLOP dispatches — so
    rows go as large as VMEM allows. Per-row temps are (bn, in) tiles whose
    minor dim pads to the 128-lane register width (at in=64 every level
    costs 2x its size; see ``_row_pack`` which removes that waste).

    ``w_bytes``: bytes/elt of the resident (F, out) weight (2 when the
    params ride bf16 under the mixed-precision policy — that is what lets
    the ViT-S 768->384 embedder *forward* keep the whole weight in VMEM).
    ``with_dw``: backward also holds the f32 (F, out) dw accumulator.
    ``scr_bytes``: bytes/elt of the (bn, F) basis scratch (2 under the bf16
    dot policy).
    ``stream_bytes``: per-row bytes of the double-buffered streamed blocks
    (x in, y/g/dx out) — these ride VMEM alongside the live set.
    ``pack``: row-pack factor. ``nin``/``out`` are the per-slot (original)
    dims; the resident weight/dw stay per-slot sized (pack-aware slice
    dots) while the per-row temps/scratch span all ``pack`` slots.
    ``slot_w``: each slot carries its OWN weight (the slot-grouped qkv
    kernels, where slots are attention heads) — the resident weight/dw
    scale with ``pack``."""
    fixed = ng * nin * out * (w_bytes + (4 if with_dw else 0)) * (
        pack if slot_w else 1
    )
    per_row = (n_temps * (ng if per_g else 1)
               * _round_up(pack * nin, 128) * 4
               # Basis scratch charged twice: the (bn, F) array itself plus
               # equal headroom for Mosaic's scheduling of the unrolled
               # slice writes (measured: it allocates beyond the obvious
               # live set at large ng).
               + 2 * ng * nin * pack * scr_bytes
               + stream_bytes)           # double-buffered io blocks
    if with_dw:
        per_row += ng * nin * pack * 4  # the backward's (bn, F) f32 gw temps
    bn = (_VMEM_BUDGET - fixed) // max(per_row, 1)
    return int(max(8, min(1024, (bn // 8) * 8)))


def _should_fuse(n: int, f: int, family: str = "", nin: int = 0,
                 kb_ok: bool = False) -> bool:
    if dispatch.get_impl() == "pallas":
        return True
    if not dispatch.use_pallas():
        return False
    # B-spline is mul/add-only (HBM-bound): the kernel wins ~1.6-1.7x at
    # N >= 200k, ties around 25-50k, and — by never materializing the basis
    # levels — runs configs whose jnp path OOMs HBM (ViT-S efficientkan at
    # N=25216 per head). Narrow inputs (the in=16 MNIST embedder) measured
    # slightly faster on jnp — require nin >= 24.
    if family == "bspline":
        # Memory guard independent of the throughput threshold: once the
        # jnp path's materialized (N, F) basis exceeds ~32M elements (64MB
        # bf16 / 128MB f32), the mul/add-only kernel wins on HBM traffic
        # alone — e.g. ViT-S *inference* at batch 64 (N=12,544 embedder
        # rows, under the training threshold). The trig families are NOT
        # guarded this way: at sine's grid-28 mapper the out-blocked
        # kernel's repeated transcendental recompute loses to XLA's fused
        # path (measured 370 -> 345 img/s), so they keep the pure
        # throughput threshold.
        if n * f >= 32 * 1024 * 1024:
            return True
        return n >= 16384 and nin >= 24
    # Round-1 measured the trig/RBF kernels as ties-or-losses; the round-2
    # machinery (row packing, bf16 MXU dots, reciprocal/shared setup)
    # flipped them at scale: ViT-S end-to-end cheby 894 -> 1,563 and fast
    # 675 -> 986 img/s under forced Pallas, with the shape-level sweep
    # (tools/tpu_ab_families.py) crossing over by N = 32768. Below that the
    # XLA path's fused transcendentals win or tie (and the tiny reference
    # configs are dispatch-bound either way). Wide-grid layers (> 8 basis
    # functions per input feature — the sine/fourier grid-28 mappers)
    # engage only when the K-blocked streaming tier fits (``kb_ok``, round
    # 3): the out-blocked tier's per-slab transcendental recompute loses
    # there (sine mapper measured 370 -> 345 img/s fused under round 2).
    return n >= 32768 and nin > 0 and (f <= 8 * nin or kb_ok)


# Grouped-qkv dispatch: one slot-grouped launch spans ALL heads, so its
# fixed costs (dispatch, grid-step overhead, basis setup) amortize over
# total head-rows n * heads — not rows alone, which is what the round-2
# per-head sweep behind ``_should_fuse``'s 32768 threshold measured. The
# round-4 sweeps on the real grouped MSA launches
# (tools/tpu_probe_sg_crossover.py -> benchmarks/sg_crossover_probe.json)
# measured Pallas winning 29/32 cells from n*h = 18912 to 151296 across
# all four sg families (cheby/bspline/rbf/sine). The three jnp cells set
# the floor: cheby loses BOTH n*h = 18912 cells (3.93 vs 3.20 ms at 12
# heads) but wins everything from 37824 up, so the floor sits between;
# the lone above-floor exception is fast 6-head/25216-row (8.44 vs 7.99,
# ~5%), re-won at equal head-rows with 12 heads. The reference MNIST
# ctor config (h=2, n=6400 -> 12800 head-rows) stays on the XLA path,
# which round 1 measured as dispatch-bound either way.
_SG_FUSE_MIN_HEAD_ROWS = 32768


def _should_fuse_sg(n: int, groups: int) -> bool:
    if dispatch.get_impl() == "pallas":
        return True
    if not dispatch.use_pallas():
        return False
    return n * groups >= _SG_FUSE_MIN_HEAD_ROWS


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Families: per-g basis slices over (bn, in) tiles
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Family:
    """setup(x, *extras) -> ctx; basis(ctx, gi) -> (bn, in);
    basis_grad(ctx, gi) -> ((bn, in), (bn, in)).

    ``lazy``: slices are computed independently per gi (sine/fourier/RBF),
    so the kernel's live set is a few transient arrays regardless of ng —
    the VMEM row-block model must not charge ng-proportional temps (that
    would lock e.g. the sine grid-28 mapper out of every kernel tier).
    Recurrence families (B-spline levels, Chebyshev terms) keep the
    ng-proportional charge."""

    ng: int
    setup: Callable
    basis: Callable
    basis_grad: Callable
    lazy: bool = False


def fourier_family(grid_size: int) -> Family:
    # Layout matches kan_bases.fourier_bases: cos(1x..Gx) then sin(1x..Gx).
    def setup(x):
        return {"x": x}

    def basis(ctx, gi):
        if gi < grid_size:
            return jnp.cos((gi + 1) * ctx["x"])
        return jnp.sin((gi - grid_size + 1) * ctx["x"])

    def basis_grad(ctx, gi):
        x = ctx["x"]
        if gi < grid_size:
            k = gi + 1
            return jnp.cos(k * x), -k * jnp.sin(k * x)
        k = gi - grid_size + 1
        return jnp.sin(k * x), k * jnp.cos(k * x)

    return Family(2 * grid_size, setup, basis, basis_grad, lazy=True)


def cheby_family(degree: int) -> Family:
    """Chebyshev via the three-term recurrence ``T_n = 2 t T_{n-1} - T_{n-2}``
    on ``t = tanh(x)`` — identical to the reference's ``cos(n acos t)`` trick
    (``cheby.py:41-43``) for |t| <= 1, but pure mul/add (``acos`` has no
    Pallas TPU lowering). Derivative recurrence:
    ``T'_n = 2 T_{n-1} + 2 t T'_{n-1} - T'_{n-2}``, chained with
    ``dt/dx = 1 - t^2``."""

    def setup(x):
        t = jnp.tanh(x)
        ts = [jnp.ones_like(t), t]
        for n in range(2, degree + 1):
            ts.append(2.0 * t * ts[n - 1] - ts[n - 2])
        return {"t": t, "ts": ts, "cache": {}}

    def basis(ctx, gi):
        return ctx["ts"][gi]

    def _dts(ctx):
        # Derivative recurrence is built lazily so the forward kernel's
        # live set stays at (deg + 2) arrays instead of double that.
        if "dts" not in ctx["cache"]:
            t, ts = ctx["t"], ctx["ts"]
            dts = [jnp.zeros_like(t), jnp.ones_like(t)]
            for n in range(2, degree + 1):
                dts.append(2.0 * ts[n - 1] + 2.0 * t * dts[n - 1] - dts[n - 2])
            ctx["cache"]["dts"] = dts
            ctx["cache"]["dtdx"] = 1.0 - t * t
        return ctx["cache"]["dts"], ctx["cache"]["dtdx"]

    def basis_grad(ctx, gi):
        dts, dtdx = _dts(ctx)
        return ctx["ts"][gi], dts[gi] * dtdx

    return Family(degree + 1, setup, basis, basis_grad)


def sine_family(grid_size: int) -> Family:
    # extras: freq (1, ng) in SMEM (scalar reads), phase (ng, in) in VMEM.
    def setup(x, freq_ref, phase_ref):
        return {"x": x, "freq": freq_ref, "phase": phase_ref}

    def _arg(ctx, gi):
        return ctx["x"] * ctx["freq"][0, gi] + ctx["phase"][gi, :]

    def basis(ctx, gi):
        return jnp.sin(_arg(ctx, gi))

    def basis_grad(ctx, gi):
        a = _arg(ctx, gi)
        return jnp.sin(a), ctx["freq"][0, gi] * jnp.cos(a)

    return Family(grid_size, setup, basis, basis_grad, lazy=True)


def sine_family_rows(grid_size: int) -> Family:
    """Sine family with PER-SLOT trainable freq (the slot-grouped qkv
    kernels, where slots are attention heads and each head trains its own
    freq — reference sinekan.py:65-70): freq and phase ride as
    ``(ng, q*nin)`` VMEM row tables with slot r's scalars tiled across its
    lane segment, so one ``x * freq[gi] + phase[gi]`` covers all slots."""

    def setup(x, freq_ref, phase_ref):
        return {"x": x, "freq": freq_ref, "phase": phase_ref}

    def _arg(ctx, gi):
        return ctx["x"] * ctx["freq"][gi, :] + ctx["phase"][gi, :]

    def basis(ctx, gi):
        return jnp.sin(_arg(ctx, gi))

    def basis_grad(ctx, gi):
        a = _arg(ctx, gi)
        return jnp.sin(a), ctx["freq"][gi, :] * jnp.cos(a)

    return Family(grid_size, setup, basis, basis_grad, lazy=True)


def rbf_family(num_grids: int, denominator: float) -> Family:
    # extras: grid (1, ng) in SMEM.
    def setup(x, grid_ref):
        return {"x": x, "grid": grid_ref}

    def _u(ctx, gi):
        return (ctx["x"] - ctx["grid"][0, gi]) / denominator

    def basis(ctx, gi):
        return jnp.exp(-_u(ctx, gi) ** 2)

    def basis_grad(ctx, gi):
        u = _u(ctx, gi)
        b = jnp.exp(-u * u)
        return b, (-2.0 / denominator) * u * b

    return Family(num_grids, setup, basis, basis_grad, lazy=True)


def _rbf_aug(grid2d, denominator):
    """Augment the ``(1, ng)`` RBF grid row with the uniform-grid recurrence
    constants consumed by ``_rbf_recur``: ``[grid | d | t_1 .. t_{ng-1}]``
    where ``d = (c_1 - c_0)/h`` and ``t_j = exp(-(j d)^2)``. Computed on the
    XLA side (tiny, fused into the call's prologue) so the kernels never
    need a scalar transcendental."""
    ng = grid2d.shape[1]
    if ng < 3:
        return grid2d
    g = grid2d.astype(jnp.float32)
    d = (g[0, 1] - g[0, 0]) / denominator
    j = jnp.arange(1, ng, dtype=jnp.float32)
    t = jnp.exp(-((j * d) ** 2))
    return jnp.concatenate([g, d.reshape(1, 1), t.reshape(1, -1)], axis=1)


def _rbf_recur(ln, grid_ref, denominator, ng):
    """Yield ``(gi, basis, u)`` for every RBF slice — the Gaussian analogue
    of the fourier family's angle-addition recurrence, cutting the kernels'
    elementwise transcendentals from ``ng`` exps to TWO.

    With ``u_g = (x - c_g)/h`` and uniform spacing ``d = Δ/h`` (FastKAN's
    grid is a fixed linspace with ``h = Δ``, reference ``fastkan.py:29-30``,
    mirrored by ``layers/kan.py``), factoring ``-u_{m±j}^2`` around the
    middle index ``m`` gives

        b_{m±j} = b_m · r^{±j} · t_j,   r = exp(2 d u_m),  t_j = exp(-(j d)^2)

    so one carried multiply per slice replaces each exp. ``d`` and the
    scalar ``t_j`` ride the augmented grid row (``_rbf_aug``). Numerics:
    every emitted value equals a true ``b_g ≤ 1``; the carried ``b_m r^j``
    is bounded by ``exp((j d)^2)`` (≤ e16 at the FastKAN geometry ng=8,
    d=1), and the ±80 clamp on r's argument only engages once ``|u_m| >
    40/d`` where ``b_m = exp(-u_m^2)`` (and every true slice) has already
    flushed to zero — it exists solely to keep ``1/r`` finite. The ``u``
    yielded alongside feeds the gradient coefficient ``-2 u b / h``.
    Assumes ``d ≲ 2.3`` (any linspace grid with the reference's
    ``h = Δ`` convention has d = 1) AND the carry bound ``(j_max d)^2 < 80``
    with ``j_max = ng - ng//2 - 1``: beyond it the carried ``b_m r^j``
    overflows f32 to inf while ``t_j`` underflows to 0, so inf * 0 = NaN
    where the direct exp is finite. ``d`` is a traced value, so the guard
    below enforces the bound at the documented d = 1 (ng <= 18); wider
    custom grids (d > 1) shrink the safe ng further.

    MEASURED NEGATIVE on v5e — opt-in via ``KANVIT_RBF_RECUR=1``: ViT-S
    fast 1,216 vs 1,253 img/s e2e, embedder 10.48 vs 10.33 ms, MSA 14.76
    vs 14.18 ms/block (same-session A/Bs). Unlike the fourier win (a
    ~20-cycle sin/cos per slice), the VPU's exp here costs no more than
    the carried multiplies that would replace it, so the recurrence only
    adds serial dependencies and live carries. Kept because it documents
    the exp-rate calibration and is the fallback shape if a future chip
    changes that balance."""
    inv = 1.0 / denominator
    # (ng - ng//2 - 1)^2 < 80 keeps the f32 carry finite at d = 1 (see
    # docstring); fall back to the direct per-slice exps otherwise.
    recur_safe = (ng - ng // 2 - 1) ** 2 < 80
    if ng < 3 or not recur_safe \
            or os.environ.get("KANVIT_RBF_RECUR", "0") != "1":
        for gi in range(ng):
            u = (ln - grid_ref[0, gi]) * inv
            yield gi, jnp.exp(-u * u), u
        return
    m = ng // 2
    d = grid_ref[0, ng]
    um = (ln - grid_ref[0, m]) * inv
    bm = jnp.exp(-um * um)
    r = jnp.exp(jnp.clip((2.0 * d) * um, -80.0, 80.0))
    yield m, bm, um
    p = bm
    for j in range(1, ng - m):
        p = p * r
        yield m + j, p * grid_ref[0, ng + j], um - j * d
    p = bm
    rinv = 1.0 / r
    for j in range(1, m + 1):
        p = p * rinv
        yield m - j, p * grid_ref[0, ng + j], um + j * d


def bspline_family(grid_size: int, spline_order: int,
                   with_base: bool = False) -> Family:
    """Cox–de Boor levels built once per tile and shared across output knots
    (reference recursion ``effkan.py:115-125``, per-column form).

    extras: ``gridT (knots, in)`` in VMEM (transposed so knot rows slice on
    the second-minor axis). Level lists hold (bn, in) tensors. The
    derivative uses the closed form
    ``B'_{k,j} = k (B_{k-1,j}/(g_{j+k}-g_j) - B_{k-1,j+1}/(g_{j+k+1}-g_{j+1}))``
    from the order-(k-1) bases the recursion builds anyway — mathematically
    identical to differentiating the blend, but it avoids carrying a
    parallel derivative list through every level (the level live set is
    what bounds the kernels' row block in VMEM).

    ``with_base``: append ``silu(x)`` as one extra basis slice so the
    KANLinear base branch (``silu(x) @ base_weight.T``, ``effkan.py:161``)
    rides the same expand-and-contract dot instead of a separate XLA
    matmul chain — measured ~1.9 ms of the ViT-S qkv projection when left
    outside (six tiny HBM-bound matmuls plus their backwards). The caller
    stacks ``base_weight`` as the last ``w3d`` slice.
    """
    ng = grid_size + spline_order + (1 if with_base else 0)
    n_spline = grid_size + spline_order

    def _levels(x, g, with_grad):
        n0 = grid_size + 2 * spline_order  # number of order-0 bases
        # Knot rows and the per-level knot-difference reciprocals are
        # (in,)-sized constants: computing them once per tile keeps every
        # (bn, in) level op mul/add-only (VPU division is many times a mul,
        # and the naive form spends two big-tile divisions per blend).
        rows = [g[j, :] for j in range(n0 + 1)]
        # Shared (bn, in) terms across blends/levels: t[j] = x - rows[j]
        # (every blend reuses two of them; recomputing per blend cost 2 of
        # its 7 VPU ops) and ge[j] = x >= rows[j] (each order-0 indicator is
        # ge[j] & ~ge[j+1]).
        t = [x - rows[j] for j in range(n0 + 1)]
        ge = [x >= rows[j] for j in range(n0 + 1)]
        b = [(ge[j] & ~ge[j + 1]).astype(x.dtype) for j in range(n0)]
        prev, inv = None, None
        for k in range(1, spline_order + 1):
            inv = [1.0 / (rows[j + k] - rows[j]) for j in range(n0 - k + 1)]
            nb = []
            for j in range(n0 - k):
                w1 = t[j] * inv[j]
                w2 = t[j + k + 1] * inv[j + 1]
                nb.append(w1 * b[j] - w2 * b[j + 1])
            prev, b = b, nb
        if not with_grad:
            return b, None
        if spline_order == 0:
            return b, [jnp.zeros_like(x) for _ in b]
        k = spline_order
        db = [
            k * (prev[j] * inv[j] - prev[j + 1] * inv[j + 1])
            for j in range(n0 - k)
        ]
        return b, db

    def setup(x, gridt_ref):
        return {"x": x, "g": gridt_ref, "cache": {}}

    def _ensure(ctx, with_grad):
        key = "grad" if with_grad else "plain"
        if key not in ctx["cache"]:
            ctx["cache"][key] = _levels(ctx["x"], ctx["g"], with_grad)
        return ctx["cache"][key]

    def _silu(ctx):
        if "sig" not in ctx["cache"]:
            ctx["cache"]["sig"] = jax.nn.sigmoid(ctx["x"])
        return ctx["x"] * ctx["cache"]["sig"]

    def basis(ctx, gi):
        if with_base and gi == n_spline:
            return _silu(ctx)
        b, _ = _ensure(ctx, False)
        return b[gi]

    def basis_grad(ctx, gi):
        if with_base and gi == n_spline:
            s = _silu(ctx)
            sig = ctx["cache"]["sig"]
            # silu'(x) = sig + x sig (1 - sig)
            return s, sig + s * (1.0 - sig)
        b, db = _ensure(ctx, True)
        return b[gi], db[gi]

    return Family(ng, setup, basis, basis_grad)


# ---------------------------------------------------------------------------
# Generic kernel template
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, family, nin, pack=1, slot_w=False):
    # Expand each basis slice into a flat (bn, ng*in) VMEM scratch, then one
    # MXU matmul against the flat weight (F, out) — XLA's schedule for the
    # jnp path, minus the HBM round trip for the basis tensor.
    #
    # Dtype policy: basis math always runs in f32 (transcendental/recurrence
    # accuracy), but with bf16 inputs the dot keeps bf16 operands with f32
    # accumulation — the MXU's native mode. An f32xf32 dot costs ~3x bf16
    # passes on v5e, so upcasting the operands would throw away most of the
    # MXU under the --bf16 training policy (and the jnp path under that
    # policy computes the basis itself in bf16, so this is strictly more
    # precise).
    #
    # Row packing (pack > 1): x carries ``pack`` original rows per kernel
    # row, so the basis math fills all 128 VPU lanes (that is what packing
    # is for — measured decisive, e.g. ViT-S sine 712 vs 488 img/s). The
    # contraction, however, does NOT use a block-diagonal packed weight
    # (which doubles the dot MACs multiplying structural zeros): the basis
    # scratch is laid out slot-major ([slot r | basis gi | feature i]) and
    # contracted per slot against the ORIGINAL (F, out) weight — packed
    # VPU fill at unpacked dot cost. ``nin`` is the per-slot width.
    #
    # ``slot_w``: slots are attention HEADS, not packed rows (the
    # slot-grouped qkv path) — w_ref is (pack*F, out) with slot r's weight
    # at rows [r*F, (r+1)*F); each slot contracts against its own weight.
    x_ref, w_ref, *extra_refs, y_ref, basis_scr = refs
    f = family.ng * nin
    out = w_ref.shape[1]
    x = x_ref[:].astype(jnp.float32)
    ctx = family.setup(x, *extra_refs)
    for gi in range(family.ng):
        t = family.basis(ctx, gi).astype(basis_scr.dtype)  # (bn, pack*nin)
        for r in range(pack):
            basis_scr[:, r * f + gi * nin : r * f + (gi + 1) * nin] = (
                t[:, r * nin : (r + 1) * nin]
            )
    w = w_ref[:].astype(basis_scr.dtype)
    for r in range(pack):
        w_r = w[r * f : (r + 1) * f] if slot_w else w
        y_ref[:, r * out : (r + 1) * out] = jax.lax.dot_general(
            basis_scr[:, r * f : (r + 1) * f], w_r, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(y_ref.dtype)


def _bwd_kernel(*refs, family, nin, pack=1, slot_w=False, grid_axis=0):
    x_ref, w_ref, g_ref, *extra_refs, dx_ref, dw_ref, basis_scr, dw_acc = refs
    i = pl.program_id(grid_axis)
    n_i = pl.num_programs(grid_axis)

    @pl.when(i == 0)
    def _init():
        dw_acc[:] = jnp.zeros_like(dw_acc)

    f = family.ng * nin
    out = w_ref.shape[1]
    x = x_ref[:].astype(jnp.float32)
    gout = g_ref[:]  # (bn, pack*out), kept in input dtype for the MXU dots
    ctx = family.setup(x, *extra_refs)

    # Per slot: gW_r = gout_r @ W^T (bn, F), then per-g elementwise reduce
    # into dx using the closed-form basis derivatives; basis itself goes to
    # the slot-major scratch for the dW matmuls. Same dtype policy as
    # _fwd_kernel: f32 basis math, input-dtype dot operands, f32
    # accumulation. With pack > 1 the slot dots contract against the
    # ORIGINAL (F, out) weight — half the MACs of the block-diagonal form
    # (and dw accumulates all slots into ONE per-slot-sized accumulator).
    w = w_ref[:].astype(gout.dtype)
    gws = [
        jax.lax.dot_general(
            gout[:, r * out : (r + 1) * out],
            w[r * f : (r + 1) * f] if slot_w else w,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bn, F) f32
        for r in range(pack)
    ]
    dxs = [jnp.zeros((x.shape[0], nin), jnp.float32) for _ in range(pack)]
    for gi in range(family.ng):
        b_g, db_g = family.basis_grad(ctx, gi)
        b_g = b_g.astype(basis_scr.dtype)
        for r in range(pack):
            basis_scr[:, r * f + gi * nin : r * f + (gi + 1) * nin] = (
                b_g[:, r * nin : (r + 1) * nin]
            )
            dxs[r] += (gws[r][:, gi * nin : (gi + 1) * nin]
                       * db_g[:, r * nin : (r + 1) * nin])
    dx = dxs[0] if pack == 1 else jnp.concatenate(dxs, axis=1)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    for r in range(pack):
        contrib = jax.lax.dot_general(
            basis_scr[:, r * f : (r + 1) * f],
            gout[:, r * out : (r + 1) * out].astype(basis_scr.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (F, out) f32
        if slot_w:
            dw_acc[r * f : (r + 1) * f, :] += contrib
        else:
            dw_acc[:] += contrib

    @pl.when(i == n_i - 1)
    def _finish():
        dw_ref[:] = dw_acc[:].astype(dw_ref.dtype)


def _fwd_kernel_ob(*refs, family, nin):
    """Out-blocked forward: grid (out_blocks, row_blocks), rows innermost.

    The (F, out) weight does not fit VMEM at wide-embedder shapes (e.g. the
    ViT-S 768 -> 384 B-spline mapper, F = 6144), so each grid column holds
    one (F, out_blk) weight slab — fetched once per out block since the row
    axis iterates fastest — and the basis is recomputed per out block
    (mul/add-only; the families are HBM-bound, not compute-bound). Same
    body math as ``_fwd_kernel``.
    """
    x_ref, w_ref, *extra_refs, y_ref, basis_scr = refs
    x = x_ref[:].astype(jnp.float32)
    ctx = family.setup(x, *extra_refs)
    for gi in range(family.ng):
        basis_scr[:, gi * nin : (gi + 1) * nin] = family.basis(ctx, gi).astype(
            basis_scr.dtype
        )
    y_ref[:] = jax.lax.dot_general(
        basis_scr[:], w_ref[:].astype(basis_scr.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y_ref.dtype)


def _bwd_kernel_ob(*refs, family, nin):
    """Out-blocked backward: grid (out_blocks, row_blocks), rows innermost.

    dW accumulates per-out-block in a (F, out_blk) VMEM scratch (rows are
    consecutive within an out block, so init at row 0 / flush at the last
    row is well-defined). dx cannot accumulate across out blocks inside the
    kernel — a row block's revisits are non-consecutive — so each out block
    writes its partial ``dxp[j] = sum_g (gout_j @ W_j^T) * dbasis_g`` and the
    caller sums the (n_ob, N, in) partials in one XLA reduction.
    """
    x_ref, w_ref, g_ref, *extra_refs, dxp_ref, dw_ref, basis_scr = refs
    i = pl.program_id(1)

    # dW accumulates directly in the (F, out_blk) f32 *output* block — row
    # visits within an out block are consecutive, so the block stays
    # VMEM-resident; skipping a separate accumulator scratch is what lets
    # the slab fit the 16MB scoped-VMEM limit alongside the basis levels.
    @pl.when(i == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    x = x_ref[:].astype(jnp.float32)
    gout = g_ref[:]  # (bn, out_blk)
    ctx = family.setup(x, *extra_refs)

    gw = jax.lax.dot_general(
        gout, w_ref[:].astype(gout.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, F) f32
    dx = jnp.zeros(x.shape, jnp.float32)
    for gi in range(family.ng):
        b_g, db_g = family.basis_grad(ctx, gi)
        basis_scr[:, gi * nin : (gi + 1) * nin] = b_g.astype(basis_scr.dtype)
        dx += gw[:, gi * nin : (gi + 1) * nin] * db_g
    dxp_ref[0] = dx.astype(dxp_ref.dtype)

    dw_ref[:] += jax.lax.dot_general(
        basis_scr[:], gout.astype(basis_scr.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# Mosaic's scoped-VMEM stack limit is 16MB; the out-blocked picker budgets
# against it directly (unlike _pick_row_block's soft budget) because it must
# model Pallas double-buffering of the streamed blocks, measured to dominate
# the fixed cost at wide-embedder shapes.
_VMEM_LIMIT_OB = 13 * 1024 * 1024


def _pick_out_block(nin: int, out: int, ng: int, n_temps: int,
                    w_bytes: int = 4, with_dw: bool = False,
                    per_g: bool = True):
    """(out_blk, bn) for the out-blocked kernels, or None if even the
    smallest slab leaves no room for a >=32-row block.

    ``w_bytes``: bytes/elt of the weight slab (2 under the bf16 dot policy).
    ``with_dw``: backward also holds the (F, out_blk) f32 dw output block.
    """
    f = ng * nin
    for ob in (256, 128):
        if out <= ob:
            continue  # blocking is only narrower than the plain kernel
        fixed = 2 * f * ob * w_bytes  # double-buffered weight slab
        if with_dw:
            fixed += 2 * f * ob * 4  # f32 dw block + its copy-out buffer
        # Basis scratch charged twice (array + Mosaic scheduling headroom
        # for the unrolled slice writes — measured at large ng).
        per_row = (n_temps * (ng if per_g else 1) * _round_up(nin, 128) * 4
                   + 2 * f * w_bytes)
        if with_dw:
            per_row += f * 4  # the backward's (bn, F) f32 gw temp
        bn = int(((_VMEM_LIMIT_OB - fixed) // max(per_row, 1) // 8) * 8)
        # Floor of 16 (vs the plain kernel's 32): sublane-padded but HBM-
        # bound at these widths, and far ahead of the XLA fallback.
        if bn >= 16:
            return ob, min(bn, 256)
    return None


def _full_vmem_spec(arr):
    ndim = arr.ndim
    return pl.BlockSpec(
        arr.shape, lambda *i, _n=ndim: (0,) * _n, memory_space=pltpu.VMEM
    )


def _smem_spec(arr):
    ndim = arr.ndim
    return pl.BlockSpec(
        arr.shape, lambda *i, _n=ndim: (0,) * _n, memory_space=pltpu.SMEM
    )


def _jnp_fwd(x2d, w2d, extras, family, nin):
    """Pure-XLA forward for shapes whose fixed VMEM live set (weights +
    (bn, F) scratch) exceeds the budget even at the minimum row block —
    degrade gracefully instead of failing at Mosaic compile time (mirror of
    the ``_fused_bwd`` guard)."""
    x = x2d.astype(jnp.float32)
    ctx = family.setup(x, *extras)
    y = jnp.zeros((x.shape[0], w2d.shape[1]), jnp.float32)
    for gi in range(family.ng):
        y = y + family.basis(ctx, gi) @ w2d[gi * nin : (gi + 1) * nin].astype(
            jnp.float32
        )
    return y.astype(x2d.dtype)


def _dot_dtype(x2d, w3d):
    """bf16 dot operands (f32 accumulate) when both inputs are bf16 — the
    MXU's native mode; f32 otherwise (tests, f32 training)."""
    if x2d.dtype == jnp.bfloat16 and w3d.dtype == jnp.bfloat16:
        return jnp.bfloat16
    return jnp.float32


def _fused_fwd_ob(x2d, w3d, extras, extra_specs, family, ob, bn):
    """Out-blocked forward (see ``_fwd_kernel_ob``). Grid (out, rows)."""
    n, nin = x2d.shape
    ng, _, out = w3d.shape
    f = ng * nin
    bn = min(bn, _round_up(n, 8))
    np_ = _round_up(n, bn)
    op_ = _round_up(out, ob)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    w2d = jnp.pad(w3d.reshape(f, out), ((0, 0), (0, op_ - out)))
    y = pl.pallas_call(
        functools.partial(_fwd_kernel_ob, family=family, nin=nin),
        grid=(op_ // ob, np_ // bn),
        in_specs=[
            pl.BlockSpec((bn, nin), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, ob), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec(
            (bn, ob), lambda j, i: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((np_, op_), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((bn, f), _dot_dtype(x2d, w3d))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w2d, *extras)
    return y[:n, :out]


def _fused_bwd_ob(x2d, w3d, g, extras, extra_specs, family, ob, bn):
    """Out-blocked backward (see ``_bwd_kernel_ob``). Returns (dx, dw)."""
    n, nin = x2d.shape
    ng, _, out = w3d.shape
    f = ng * nin
    bn = min(bn, _round_up(n, 8))
    np_ = _round_up(n, bn)
    op_ = _round_up(out, ob)
    n_ob = op_ // ob
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    gp = jnp.pad(g, ((0, np_ - n), (0, op_ - out)))
    w2d = jnp.pad(w3d.reshape(f, out), ((0, 0), (0, op_ - out)))
    dxp, dw2d = pl.pallas_call(
        functools.partial(_bwd_kernel_ob, family=family, nin=nin),
        grid=(n_ob, np_ // bn),
        in_specs=[
            pl.BlockSpec((bn, nin), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, ob), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, ob), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec(
                (1, bn, nin), lambda j, i: (j, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((f, ob), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_ob, np_, nin), jnp.float32),
            jax.ShapeDtypeStruct((f, op_), jnp.float32),  # in-block dw acc
        ],
        scratch_shapes=[pltpu.VMEM((bn, f), _dot_dtype(x2d, w3d))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w2d, gp, *extras)
    dx = jnp.sum(dxp, axis=0)[:n].astype(x2d.dtype)
    dw2d = dw2d[:, :out].astype(w3d.dtype)
    return dx, dw2d.reshape(ng, nin, out)


# Cap on the (N, F) basis residual the split backward may park in HBM.
_SPLIT_HBM_CAP = 1536 * 1024 * 1024


def _bwd_plain_bn(n, nin, ng, out, xb, wb, db):
    stream = 2 * (
        _round_up(nin, 128) * (xb + xb)    # x in, dx out
        + _round_up(out, 128) * xb         # g in (cotangent rides y dtype)
    )
    return min(
        _pick_row_block(nin, out, ng, n_temps=3, w_bytes=wb, with_dw=True,
                        scr_bytes=db, stream_bytes=stream),
        _round_up(n, 8),
    )


def _dx_row_block(n, nin, ng, out, xb, wb):
    """Row block for the dx-only kernel: full (F, out) weight resident,
    per-row live set = (bn, F) f32 gw + grad levels + streamed io."""
    f = ng * nin
    fixed = f * out * wb
    per_row = (
        f * 4                                       # gw (bn, F) f32
        + 3 * ng * _round_up(nin, 128) * 4          # grad-level temps
        + 2 * (2 * _round_up(nin, 128) * xb + _round_up(out, 128) * xb)
    )
    bn = (_VMEM_BUDGET - fixed) // max(per_row, 1)
    return int(max(8, min(512, (bn // 8) * 8)))


def _bwd_strategy(n, nin, ng, out, xb, wb, db) -> str:
    """Backward implementation for a (N, in) x (ng, in, out) layer:

    - "plain": single joint kernel, full weight + f32 dw accumulator in
      VMEM (narrow/medium layers).
    - "split": forward emits the (N, F) basis to HBM as a residual; dx is a
      row-grid kernel with the weight resident (no basis needed), dw is one
      XLA matmul basis^T @ g. For wide layers (the ViT-S 768 -> 384
      embedder) this replaces the out-blocked joint kernel, which pays a
      full basis recompute per out slab.
    - "ob": out-blocked joint kernel (weight slabs; basis recomputed per
      slab) when the basis residual would be too large.
    - "xla": pure-XLA fallback for shapes beyond all kernel tiers.

    ``KANVIT_BWD=plain|split`` forces a strategy when feasible (A/B escape
    hatch — e.g. measuring basis-residual reuse vs in-kernel recompute on
    the qkv projections, tools/tpu_probe_qkv_split.py).
    """
    plain_ok = _bwd_plain_bn(n, nin, ng, out, xb, wb, db) >= 32
    split_ok = (
        n >= 1024
        and n * ng * nin * db <= _SPLIT_HBM_CAP
        and min(_dx_row_block(n, nin, ng, out, xb, wb), _round_up(n, 8)) >= 32
    )
    force = os.environ.get("KANVIT_BWD", "")
    if force == "plain" and plain_ok:
        return "plain"
    if force == "split" and split_ok:
        return "split"
    # Round-3 A/B (tools/tpu_probe_qkv_split.py): at the ViT-S shared-basis
    # qkv shape, split measures FASTER in isolation (3.79 vs 4.85 ms
    # fwd+bwd) but SLOWER end-to-end (1,345 vs 1,359 img/s) — 12 blocks of
    # live (N, F) residuals (~4.6 GB) degrade the rest of the step's HBM
    # behavior. Plain therefore stays the default wherever it fits; split
    # serves the wide layers plain cannot hold (and the KANVIT_BWD hatch
    # preserves the A/B).
    if plain_ok:
        return "plain"
    if split_ok:
        return "split"
    if _pick_out_block(nin, out, ng, n_temps=4, with_dw=True, w_bytes=db):
        return "ob"
    return "xla"


def _fwd_kernel_basis(*refs, family, nin):
    """Forward that also writes the (bn, F) basis block to HBM (the split
    backward's residual). Same math as ``_fwd_kernel`` with the scratch
    promoted to an output."""
    x_ref, w_ref, *extra_refs, y_ref, b_ref = refs
    x = x_ref[:].astype(jnp.float32)
    ctx = family.setup(x, *extra_refs)
    for gi in range(family.ng):
        b_ref[:, gi * nin : (gi + 1) * nin] = family.basis(ctx, gi).astype(
            b_ref.dtype
        )
    y_ref[:] = jax.lax.dot_general(
        b_ref[:], w_ref[:].astype(b_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y_ref.dtype)


def _dx_kernel(*refs, family, nin):
    """dx-only backward: gw = g @ W^T then dx = sum_g gw_g * dbasis_g.
    No basis scratch and no dw accumulator — the full weight fits VMEM at
    shapes where the joint kernel cannot."""
    x_ref, w_ref, g_ref, *extra_refs, dx_ref = refs
    x = x_ref[:].astype(jnp.float32)
    gout = g_ref[:]
    ctx = family.setup(x, *extra_refs)
    gw = jax.lax.dot_general(
        gout, w_ref[:].astype(gout.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, F) f32
    dx = jnp.zeros(x.shape, jnp.float32)
    for gi in range(family.ng):
        _, db_g = family.basis_grad(ctx, gi)
        dx += gw[:, gi * nin : (gi + 1) * nin] * db_g
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _fused_fwd_basis(x2d, w3d, extras, extra_specs, family):
    """Forward returning (y (N, out), basis (N, F)) for the split backward."""
    n, nin = x2d.shape
    ng, _, out = w3d.shape
    f = ng * nin
    bd = _dot_dtype(x2d, w3d)
    db = jnp.dtype(bd).itemsize
    xb = x2d.dtype.itemsize
    stream = 2 * (
        _round_up(nin, 128) * xb + _round_up(out, 128) * xb + f * db
    )
    bn = min(
        _pick_row_block(nin, out, ng, n_temps=2, w_bytes=w3d.dtype.itemsize,
                        with_dw=False, scr_bytes=0, stream_bytes=stream),
        _round_up(n, 8),
    )
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    y, basis = pl.pallas_call(
        functools.partial(_fwd_kernel_basis, family=family, nin=nin),
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, nin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec((bn, out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, out), x2d.dtype),
            jax.ShapeDtypeStruct((np_, f), bd),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w3d.reshape(f, out), *extras)
    return y[:n], basis[:n]


def _fused_bwd_split(x2d, w3d, g, basis, extras, extra_specs, family):
    """Split backward (see ``_bwd_strategy``): Pallas dx + XLA dw."""
    n, nin = x2d.shape
    ng, _, out = w3d.shape
    f = ng * nin
    xb = x2d.dtype.itemsize
    bn = min(
        _dx_row_block(n, nin, ng, out, xb, w3d.dtype.itemsize),
        _round_up(n, 8),
    )
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    gp = jnp.pad(g, ((0, np_ - n), (0, 0)))
    dx = pl.pallas_call(
        functools.partial(_dx_kernel, family=family, nin=nin),
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, nin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((bn, nin), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, nin), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w3d.reshape(f, out), gp, *extras)
    dw2d = jax.lax.dot_general(
        basis, g.astype(basis.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w3d.dtype)  # (F, out)
    return dx[:n], dw2d.reshape(ng, nin, out)


def _fused_fwd(x2d, w3d, extras, extra_specs, family):
    """x2d: (N, pack*in); w3d: (ng, in, out). Returns y (N, pack*out).

    ``pack`` is inferred from the width ratio: row-packed callers pass the
    packed x with the ORIGINAL weight (pack-aware slice dots — see
    ``_fwd_kernel``); extras arrive pre-tiled to the packed width."""
    n, nin_p = x2d.shape
    ng, nin, out = w3d.shape
    pack = nin_p // nin
    f = ng * nin
    db = jnp.dtype(_dot_dtype(x2d, w3d)).itemsize
    xb = x2d.dtype.itemsize
    stream = 2 * (_round_up(nin_p, 128) * xb
                  + _round_up(pack * out, 128) * xb)
    bn = min(
        _pick_row_block(nin, out, ng, n_temps=2, w_bytes=w3d.dtype.itemsize,
                        with_dw=False, scr_bytes=db, stream_bytes=stream,
                        per_g=not family.lazy, pack=pack),
        _round_up(n, 8),
    )
    if bn < 32:
        if pack > 1:
            # Fall back to the block-diagonal packed form the non-plain
            # tiers expect (never hit at current model shapes).
            return _fused_fwd(x2d, _pack_w3d(w3d, pack), extras,
                              extra_specs, family)
        obn = _pick_out_block(
            nin, out, ng, n_temps=4,
            w_bytes=jnp.dtype(_dot_dtype(x2d, w3d)).itemsize,
            per_g=not family.lazy,
        )
        if obn is not None:
            return _fused_fwd_ob(x2d, w3d, extras, extra_specs, family, *obn)
        extras_arrays = tuple(jnp.asarray(e) for e in extras)
        return _jnp_fwd(x2d, w3d.reshape(f, out), extras_arrays, family, nin)
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    w2d = w3d.reshape(f, out)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, family=family, nin=nin, pack=pack),
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, nin_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec(
            (bn, pack * out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((np_, pack * out), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((bn, pack * f), _dot_dtype(x2d, w3d))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w2d, *extras)
    return y[:n]


def _jnp_bwd(x2d, w2d, g, extras, family, nin):
    """Pure-XLA backward for shapes whose dw accumulator ((F, out) f32)
    cannot fit VMEM (very wide embedders). The forward stays fused — that is
    where the activation-memory win lives; this backward materializes the
    basis transiently in HBM."""
    ng = family.ng
    x = x2d.astype(jnp.float32)
    gout = g.astype(jnp.float32)
    ctx = family.setup(x, *extras)
    gw = gout @ w2d.astype(jnp.float32).T  # (N, F)
    dx = jnp.zeros_like(x)
    dw_cols = []
    for gi in range(ng):
        b_g, db_g = family.basis_grad(ctx, gi)
        dx = dx + gw[:, gi * nin : (gi + 1) * nin] * db_g
        dw_cols.append(b_g.T @ gout)  # (in, out)
    dw2d = jnp.concatenate(dw_cols, axis=0)  # (F, out)
    return dx.astype(x2d.dtype), dw2d.astype(w2d.dtype)


def _unpack_dw(dw_bd, pack):
    """Fold a block-diagonal packed dw (ng, pack*in, pack*out) back to the
    per-slot (ng, in, out): the pack transform replicates w into the
    diagonal blocks, so its VJP sums the diagonal blocks' gradients."""
    ng, nin_p, out_p = dw_bd.shape
    nin, out = nin_p // pack, out_p // pack
    return sum(
        dw_bd[:, r * nin : (r + 1) * nin, r * out : (r + 1) * out]
        for r in range(pack)
    )


def _fused_bwd(x2d, w3d, g, extras, extra_specs, family):
    """Returns (dx (N, pack*in), dw (ng, in, out)). ``pack`` inferred as in
    ``_fused_fwd``."""
    n, nin_p = x2d.shape
    ng, nin, out = w3d.shape
    pack = nin_p // nin
    f = ng * nin
    db = jnp.dtype(_dot_dtype(x2d, w3d)).itemsize
    xb = x2d.dtype.itemsize
    stream = 2 * (
        _round_up(nin_p, 128) * (xb + xb)                  # x in, dx out
        + _round_up(pack * out, 128) * g.dtype.itemsize    # g in
    )
    bn = min(
        _pick_row_block(nin, out, ng, n_temps=3, w_bytes=w3d.dtype.itemsize,
                        with_dw=True, scr_bytes=db, stream_bytes=stream,
                        per_g=not family.lazy, pack=pack),
        _round_up(n, 8),
    )
    if bn < 32:
        if pack > 1:
            dx, dw_bd = _fused_bwd(x2d, _pack_w3d(w3d, pack), g, extras,
                                   extra_specs, family)
            return dx, _unpack_dw(dw_bd, pack)
        obn = _pick_out_block(
            nin, out, ng, n_temps=4, with_dw=True,
            w_bytes=jnp.dtype(_dot_dtype(x2d, w3d)).itemsize,
            per_g=not family.lazy,
        )
        if obn is not None:
            return _fused_bwd_ob(x2d, w3d, g, extras, extra_specs, family, *obn)
        # dw accumulator too large even per out slab — XLA backward instead.
        extras_arrays = tuple(jnp.asarray(e) for e in extras)
        dx, dw2d = _jnp_bwd(x2d, w3d.reshape(f, out), g, extras_arrays, family, nin)
        return dx, dw2d.reshape(ng, nin, out)
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    gp = jnp.pad(g, ((0, np_ - n), (0, 0)))  # zero g rows -> zero dw contrib
    w2d = w3d.reshape(f, out)
    dx, dw2d = pl.pallas_call(
        functools.partial(_bwd_kernel, family=family, nin=nin, pack=pack),
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, nin_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bn, pack * out), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec((bn, nin_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, nin_p), x2d.dtype),
            jax.ShapeDtypeStruct((f, out), w3d.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, pack * f), _dot_dtype(x2d, w3d)),
            pltpu.VMEM((f, out), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w2d, gp, *extras)
    return dx[:n], dw2d.reshape(ng, nin, out)


# --- slot-grouped qkv tier (heads as slots; zero-transpose MSA) -------------
#
# MSA's per-head KAN projections cost ~4.7 ms/block of pure GLUE at ViT-S
# (MSA 13.07 ms - qkv op 4.64 - attention 3.77; tools/tpu_probe_qkv_parts.py):
# the (B,T,H,dh) -> (H,B,T,dh) transpose feeding the vmapped kernels, its
# grad transpose on the backward, the row-pack relayouts, and the per-head
# output moveaxis are each a full HBM round trip that cannot fuse across
# the Pallas custom-call boundary. This tier removes them: ONE kernel over
# grid (head-group, row-block) whose BlockSpecs index head lanes directly
# in the (B*T, H*dh) activation — slots are HEADS (q = 128/dh per program
# keeps lane blocks 128-wide), each slot contracting against its own
# weight stacked on the sublane axis ((q*F, out) resident per program).
# Identical math to the vmapped per-head path (reference attention.py
# per-head dispatch, attention.py:143-170); zero kernel-side transposes.

def _sg_slots(n_heads: int, d_head: int):
    """Heads per program, or None when the lane blocking cannot be legal
    (lane blocks must be 128-multiples or the full minor dim)."""
    q = max(1, 128 // max(d_head, 1))
    if q >= n_heads:
        return n_heads  # one program spans all heads: full-minor-dim block
    if n_heads % q == 0 and (q * d_head) % 128 == 0:
        return q
    return None


def _sg_bn(nin, out, family, x2d, w_sg, qslots, with_dw):
    db = jnp.dtype(_dot_dtype(x2d, w_sg)).itemsize
    xb = x2d.dtype.itemsize
    n_io = 4 if with_dw else 2  # x (+g) in, y (dx) out
    stream = n_io * (_round_up(qslots * nin, 128) * xb
                     + _round_up(qslots * out, 128) * xb)
    return _pick_row_block(
        nin, out, family.ng, n_temps=3 if with_dw else 2,
        w_bytes=w_sg.dtype.itemsize, with_dw=with_dw, scr_bytes=db,
        stream_bytes=stream, per_g=not family.lazy, pack=qslots, slot_w=True,
    )


def _fused_fwd_sg(x2d, w_sg, extras, extra_specs, family, nin, qslots):
    """x2d (N, G*nin) head-sliced lanes; w_sg (G*F, out) slot-stacked.
    Returns y (N, G*out) with slot g's projections at [g*out, (g+1)*out)."""
    n, d_all = x2d.shape
    groups = d_all // nin
    f = family.ng * nin
    out = w_sg.shape[1]
    bn = min(_sg_bn(nin, out, family, x2d, w_sg, qslots, False),
             _round_up(n, 8))
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, family=family, nin=nin, pack=qslots,
                          slot_w=True),
        grid=(groups // qslots, np_ // bn),
        in_specs=[
            pl.BlockSpec((bn, qslots * nin), lambda hp, i: (i, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qslots * f, out), lambda hp, i: (hp, 0),
                         memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((bn, qslots * out), lambda hp, i: (i, hp),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, groups * out), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((bn, qslots * f), _dot_dtype(x2d, w_sg))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_SG_VMEM_LIMIT,
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w_sg, *extras)
    return y[:n]


def _fused_bwd_sg(x2d, w_sg, g, extras, extra_specs, family, nin, qslots):
    """Returns (dx (N, G*nin), dw (G*F, out)). Row blocks iterate innermost
    so each head group's f32 dw accumulator stays VMEM-resident across all
    rows (reset at i==0, flushed at the last row block — the _bwd_kernel
    pattern with the row axis at grid position 1)."""
    n, d_all = x2d.shape
    groups = d_all // nin
    f = family.ng * nin
    out = w_sg.shape[1]
    bn = min(_sg_bn(nin, out, family, x2d, w_sg, qslots, True),
             _round_up(n, 8))
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    gp = jnp.pad(g, ((0, np_ - n), (0, 0)))  # zero rows -> zero dw contribs
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, family=family, nin=nin, pack=qslots,
                          slot_w=True, grid_axis=1),
        grid=(groups // qslots, np_ // bn),
        in_specs=[
            pl.BlockSpec((bn, qslots * nin), lambda hp, i: (i, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qslots * f, out), lambda hp, i: (hp, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, qslots * out), lambda hp, i: (i, hp),
                         memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec((bn, qslots * nin), lambda hp, i: (i, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qslots * f, out), lambda hp, i: (hp, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, d_all), x2d.dtype),
            jax.ShapeDtypeStruct((groups * f, out), w_sg.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, qslots * f), _dot_dtype(x2d, w_sg)),
            pltpu.VMEM((qslots * f, out), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_SG_VMEM_LIMIT,
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w_sg, gp, *extras)
    return dx[:n], dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _bspline_op_sg(x2d, w_sg, gridt_q, grid_size, spline_order, with_base,
                   qslots):
    fam = bspline_family(grid_size, spline_order, with_base)
    nin = gridt_q.shape[1] // qslots
    return _fused_fwd_sg(x2d, w_sg, (gridt_q,), (_full_vmem_spec(gridt_q),),
                         fam, nin, qslots)


def _bspline_op_sg_fwd(x2d, w_sg, gridt_q, grid_size, spline_order,
                       with_base, qslots):
    y = _bspline_op_sg(x2d, w_sg, gridt_q, grid_size, spline_order,
                       with_base, qslots)
    return y, (x2d, w_sg, gridt_q)


def _bspline_op_sg_bwd(grid_size, spline_order, with_base, qslots, res, g):
    x2d, w_sg, gridt_q = res
    fam = bspline_family(grid_size, spline_order, with_base)
    nin = gridt_q.shape[1] // qslots
    dx, dw = _fused_bwd_sg(x2d, w_sg, g, (gridt_q,),
                           (_full_vmem_spec(gridt_q),), fam, nin, qslots)
    return dx, dw, jnp.zeros_like(gridt_q)


_bspline_op_sg.defvjp(_bspline_op_sg_fwd, _bspline_op_sg_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _cheby_op_sg(x2d, w_sg, degree, nin, qslots):
    return _fused_fwd_sg(x2d, w_sg, (), (), cheby_family(degree), nin, qslots)


def _cheby_op_sg_fwd(x2d, w_sg, degree, nin, qslots):
    return _cheby_op_sg(x2d, w_sg, degree, nin, qslots), (x2d, w_sg)


def _cheby_op_sg_bwd(degree, nin, qslots, res, g):
    x2d, w_sg = res
    dx, dw = _fused_bwd_sg(x2d, w_sg, g, (), (), cheby_family(degree), nin,
                           qslots)
    return dx, dw


_cheby_op_sg.defvjp(_cheby_op_sg_fwd, _cheby_op_sg_bwd)


def bspline_qkv_grouped(x2d, grid, bw, sw, sc, spline_order=3):
    """Grouped-head joint q/k/v B-spline projection.

    ``x2d (N, H*dh)`` head-sliced activation (head h at lanes
    [h*dh, (h+1)*dh) — the reference's slicing, attention.py:195-197);
    ``bw (H, out, dh)``, ``sw (H, out, dh, ng)``, ``sc (H, out, dh)`` the
    per-head q/k/v-concatenated KANLinear params (out = 3*dh); ``grid``
    the shared (dh, knots) table. Returns ``y (N, H*out)`` with head h at
    [h*out, (h+1)*out), or None when the slot grouping or VMEM model says
    the shape cannot run here (caller falls back to the vmapped path)."""
    h, out, dh = bw.shape
    ng = sw.shape[-1]
    q = _sg_slots(h, dh)
    if q is None or not _should_fuse_sg(x2d.shape[0], h):
        return None
    fam_probe = bspline_family(grid.shape[1] - 2 * spline_order - 1,
                               spline_order, True)
    gridt_q = jnp.tile(grid.T, (1, q)).astype(jnp.float32)
    w_probe = jnp.zeros((1, 1), sw.dtype)
    if min(_sg_bn(dh, out, fam_probe, x2d, w_probe, q, False),
           _sg_bn(dh, out, fam_probe, x2d, w_probe, q, True)) < 32:
        return None
    # (H, ng+1, dh, out): spline slices then the silu base slice (the
    # bspline_family(with_base=True) slice order), flattened slot-major.
    scaled = (sw * sc[..., None]).transpose(0, 3, 2, 1)  # (H, ng, dh, out)
    base = bw.transpose(0, 2, 1)[:, None]                # (H, 1, dh, out)
    w_sg = jnp.concatenate([scaled, base], axis=1).reshape(
        h * (ng + 1) * dh, out
    )
    grid_size = grid.shape[1] - 2 * spline_order - 1
    return _bspline_op_sg(x2d, w_sg, gridt_q, grid_size, spline_order, True,
                          q)


def cheby_qkv_grouped(x2d, cc):
    """Grouped-head joint q/k/v Chebyshev projection. ``cc (H, dh, out, D)``
    per-head q/k/v-concatenated coeffs (out = 3*dh). Same contract as
    ``bspline_qkv_grouped``."""
    h, dh, out, deg1 = cc.shape
    q = _sg_slots(h, dh)
    if q is None or not _should_fuse_sg(x2d.shape[0], h):
        return None
    fam = cheby_family(deg1 - 1)
    w_probe = jnp.zeros((1, 1), cc.dtype)
    if min(_sg_bn(dh, out, fam, x2d, w_probe, q, False),
           _sg_bn(dh, out, fam, x2d, w_probe, q, True)) < 32:
        return None
    w_sg = cc.transpose(0, 3, 1, 2).reshape(h * deg1 * dh, out)
    return _cheby_op_sg(x2d, w_sg, deg1 - 1, dh, q)


# --- slot-grouped SineKAN projection (heads as slots, in-kernel dfreq) ------
#
# Sine's basis depends on per-head trainable freq (reference
# sinekan.py:65-70), so q/k/v cannot share one expansion — but like fast,
# each PROJECTION runs as one slot-grouped launch over all heads straight
# off the (B*T, H*dh) activation, with freq/phase as (ng, q*dh) row tables
# (slot r's scalars tiled across its lane segment).
#
# Unlike the other sg families this one does NOT use the slot-major basis
# scratch + slice-dot template: at the sine MSA shape (ng=4, dh=64) the
# dots are trivial (~7 GFLOP/projection) and the template's per-slot
# 64-lane scatter writes dominate (measured 3.4 ms fwd / 4.0 ms bwd per
# projection, ~10x roofline — tools/tpu_probe_sine_sg.py). Instead each
# basis SLICE contracts immediately against a per-slice block-diagonal
# (q*nin, q*out) weight: every read/write stays 128-lane aligned, no
# scratch exists, and the structural-zero MACs are noise at this scale
# (the same trade that LOSES for the big-dot families).

def _fwd_kernel_sine_sg(x_ref, w_ref, freq_ref, phase_ref, y_ref,
                        *, nin, ng, qslots):
    qn = qslots * nin
    x = x_ref[:].astype(jnp.float32)
    dd = _dot_dtype(x_ref, w_ref)
    acc = None
    for gi in range(ng):
        a = x * freq_ref[gi, :] + phase_ref[gi, :]
        s = jnp.sin(a).astype(dd)
        d = jax.lax.dot_general(
            s, w_ref[gi * qn : (gi + 1) * qn, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    y_ref[:] = acc.astype(y_ref.dtype)


def _bwd_kernel_sine_sg(x_ref, w_ref, g_ref, freq_ref, phase_ref,
                        dx_ref, dw_ref, dfreq_ref, dw_acc, df_acc,
                        *, nin, ng, qslots):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        dw_acc[:] = jnp.zeros_like(dw_acc)
        df_acc[:] = jnp.zeros_like(df_acc)

    qn = qslots * nin
    x = x_ref[:].astype(jnp.float32)
    gout = g_ref[:]
    w = w_ref[:].astype(gout.dtype)
    dd = _dot_dtype(x_ref, w_ref)
    dx = jnp.zeros((x.shape[0], qn), jnp.float32)
    dfrows = []
    for gi in range(ng):
        fr = freq_ref[gi, :]
        a = x * fr + phase_ref[gi, :]
        c = jnp.cos(a)
        s = jnp.sin(a).astype(dd)
        # gw slice: (bn, q*nin) via the block-diag weight's transpose —
        # full-width and aligned, no per-slot stitching.
        gw = jax.lax.dot_general(
            gout, w[gi * qn : (gi + 1) * qn, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx += gw * (fr * c)
        dfrows.append(jnp.sum(gw * x * c, axis=0, keepdims=True))
        # Dense (q*nin, q*out) dw block; the wrapper's (differentiable)
        # block-diag construction discards the off-diagonal cross terms.
        dw_acc[gi * qn : (gi + 1) * qn, :] += jax.lax.dot_general(
            s, gout.astype(dd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dx_ref[:] = dx.astype(dx_ref.dtype)
    df_acc[:] += (dfrows[0] if ng == 1
                  else jnp.concatenate(dfrows, axis=0))

    @pl.when(i == n_i - 1)
    def _finish():
        dw_ref[:] = dw_acc[:].astype(dw_ref.dtype)
        dfreq_ref[:] = df_acc[:].astype(dfreq_ref.dtype)


def _sine_sg_bn(nin, out, ng, x2d, w_sg, qslots, with_dw):
    """Row block for the block-diag sine sg kernels: resident weight
    (ng*q*nin, q*out) (+ f32 dw acc), ~8 f32 (bn, q*nin) live rows bwd."""
    qn = _round_up(qslots * nin, 128)
    qo = _round_up(qslots * out, 128)
    fixed = ng * qn * qo * (w_sg.dtype.itemsize + (4 if with_dw else 0))
    xb = x2d.dtype.itemsize
    n_io = 4 if with_dw else 2
    per_row = (8 if with_dw else 4) * qn * 4 + n_io * (qn + qo) * xb
    bn = (_VMEM_BUDGET - fixed) // max(per_row, 1)
    return int(max(8, min(1024, (bn // 8) * 8)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _sine_op_sg(x2d, w_sg, freqrow, phaserow, ng, nin, qslots):
    n, d_all = x2d.shape
    groups = d_all // nin
    qn, qo = qslots * nin, w_sg.shape[1]
    bn = min(_sine_sg_bn(nin, qo // qslots, ng, x2d, w_sg, qslots, False),
             _round_up(n, 8))
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    rows = lambda: pl.BlockSpec((ng, qn), lambda hp, i: (0, hp),
                                memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel_sine_sg, nin=nin, ng=ng, qslots=qslots),
        grid=(groups // qslots, np_ // bn),
        in_specs=[
            pl.BlockSpec((bn, qn), lambda hp, i: (i, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng * qn, qo), lambda hp, i: (hp, 0),
                         memory_space=pltpu.VMEM),
            rows(), rows(),
        ],
        out_specs=pl.BlockSpec((bn, qo), lambda hp, i: (i, hp),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, (groups // qslots) * qo),
                                       x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w_sg, freqrow, phaserow)
    return y[:n]


def _sine_op_sg_fwd(x2d, w_sg, freqrow, phaserow, ng, nin, qslots):
    y = _sine_op_sg(x2d, w_sg, freqrow, phaserow, ng, nin, qslots)
    return y, (x2d, w_sg, freqrow, phaserow)


def _sine_op_sg_bwd(ng, nin, qslots, res, g):
    x2d, w_sg, freqrow, phaserow = res
    n, d_all = x2d.shape
    groups = d_all // nin
    qn, qo = qslots * nin, w_sg.shape[1]
    bn = min(_sine_sg_bn(nin, qo // qslots, ng, x2d, w_sg, qslots, True),
             _round_up(n, 8))
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    gp = jnp.pad(g, ((0, np_ - n), (0, 0)))
    rows = lambda: pl.BlockSpec((ng, qn), lambda hp, i: (0, hp),
                                memory_space=pltpu.VMEM)
    dx, dw, dfreq = pl.pallas_call(
        functools.partial(_bwd_kernel_sine_sg, nin=nin, ng=ng, qslots=qslots),
        grid=(groups // qslots, np_ // bn),
        in_specs=[
            pl.BlockSpec((bn, qn), lambda hp, i: (i, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng * qn, qo), lambda hp, i: (hp, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, qo), lambda hp, i: (i, hp),
                         memory_space=pltpu.VMEM),
            rows(), rows(),
        ],
        out_specs=[
            pl.BlockSpec((bn, qn), lambda hp, i: (i, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng * qn, qo), lambda hp, i: (hp, 0),
                         memory_space=pltpu.VMEM),
            rows(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, d_all), x2d.dtype),
            jax.ShapeDtypeStruct(((groups // qslots) * ng * qn, qo),
                                 w_sg.dtype),
            jax.ShapeDtypeStruct((ng, d_all), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ng * qn, qo), jnp.float32),
            pltpu.VMEM((ng, qn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w_sg, gp, freqrow, phaserow)
    return dx[:n], dw, dfreq.astype(freqrow.dtype), jnp.zeros_like(phaserow)


_sine_op_sg.defvjp(_sine_op_sg_fwd, _sine_op_sg_bwd)


def sinekan_qkv_grouped(x2d, freq, phase, amplitudes, bias):
    """Grouped-head SineKAN projection (one of q/k/v).

    ``x2d (N, H*dh)`` head-sliced activation; ``freq (H, ng)`` per-head
    trainable harmonics; ``phase (dh, ng)`` the deterministic damped table
    (identical across heads, reference sinekan.py:59-75);
    ``amplitudes (H, out, dh, ng)``; ``bias (H, out)`` or None. Returns
    ``y (N, H*out)``, or None when the slot grouping or VMEM model says the
    shape cannot run here. dfreq flows back through the (differentiable)
    row-table construction; dphase is discarded (buffer, not a param)."""
    h, out, dh, ng = amplitudes.shape
    q = _sg_slots(h, dh)
    if q is None or not _should_fuse_sg(x2d.shape[0], h):
        return None
    w_probe = jnp.zeros((1, 1), amplitudes.dtype)
    if min(_sine_sg_bn(dh, out, ng, x2d, w_probe, q, False),
           _sine_sg_bn(dh, out, ng, x2d, w_probe, q, True)) < 32:
        return None
    # Per-slice block-diagonal weight: (G, ng, q, dh, q, out) with head
    # r's (dh, out) on the diagonal, flattened to (G*ng*q*dh, q*out). The
    # eye-mul construction is differentiable, so the kernel's dense dw
    # block transposes back through it, discarding cross-slot terms.
    g_ = h // q
    w5 = amplitudes.transpose(3, 0, 2, 1).reshape(ng, g_, q, dh, out)
    eye = jnp.eye(q, dtype=amplitudes.dtype)
    wbd = (w5.transpose(1, 0, 2, 3, 4)[:, :, :, :, None, :]
           * eye[None, None, :, None, :, None])
    w_sg = wbd.reshape(g_ * ng * q * dh, q * out)
    freqrow = jnp.repeat(
        freq.T[:, :, None].astype(jnp.float32), dh, axis=2
    ).reshape(ng, h * dh)
    phaserow = jnp.tile(phase.T.astype(jnp.float32), (1, h))
    y = _sine_op_sg(x2d, w_sg, freqrow, phaserow, ng, dh, q)
    if bias is not None:
        y = y + bias.reshape(1, h * out)
    return y


# --- sine plain tier with in-kernel dfreq ----------------------------------
#
# SineKAN's freq is trainable (reference sinekan.py:65-70), and the XLA
# dfreq expression at MSA shapes materializes TWO (H, N, in, ng) f32 temps
# (the basis-grad and the g@W^T gather) — ~2.5 GB of HBM traffic per
# projection at the ViT-S sine MSA, x3 projections x12 blocks. The kb tier
# already folds dfreq into its dw pass for the wide mappers; this kernel
# does the same for the weight-resident plain tier the MSA heads use:
# ``dfreq_g += sum(gw_g * x * cos(arg))`` rides the joint dx/dw pass where
# gw and cos(arg) are already in VMEM, so dfreq costs one extra
# multiply-reduce and no HBM.

def _bwd_kernel_sine(x_ref, w_ref, g_ref, freq_ref, phase_ref,
                     dx_ref, dw_ref, dfreq_ref, basis_scr, dw_acc, dfacc,
                     *, nin, ng, pack=1):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dw_acc[:] = jnp.zeros_like(dw_acc)
        for gi in range(ng):
            dfacc[0, gi] = 0.0

    f = ng * nin
    out = w_ref.shape[1]
    x = x_ref[:].astype(jnp.float32)
    gout = g_ref[:]
    w = w_ref[:].astype(gout.dtype)
    # Pack-aware slice dots (see _bwd_kernel): per-slot gW against the
    # original (F, out) weight; freq is shared across slots, so dfreq sums
    # the per-slot reductions.
    gws = [
        jax.lax.dot_general(
            gout[:, r * out : (r + 1) * out], w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bn, F) f32
        for r in range(pack)
    ]
    dxs = [jnp.zeros((x.shape[0], nin), jnp.float32) for _ in range(pack)]
    for gi in range(ng):
        fg = freq_ref[0, gi]
        a = x * fg + phase_ref[gi, :]
        c = jnp.cos(a)
        s = jnp.sin(a).astype(basis_scr.dtype)
        df = jnp.float32(0.0)
        for r in range(pack):
            sl = slice(r * nin, (r + 1) * nin)
            basis_scr[:, r * f + gi * nin : r * f + (gi + 1) * nin] = s[:, sl]
            gwg = gws[r][:, gi * nin : (gi + 1) * nin]
            dxs[r] += gwg * (fg * c[:, sl])
            df += jnp.sum(gwg * x[:, sl] * c[:, sl])
        dfacc[0, gi] += df
    dx = dxs[0] if pack == 1 else jnp.concatenate(dxs, axis=1)
    dx_ref[:] = dx.astype(dx_ref.dtype)
    for r in range(pack):
        dw_acc[:] += jax.lax.dot_general(
            basis_scr[:, r * f : (r + 1) * f],
            gout[:, r * out : (r + 1) * out].astype(basis_scr.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == n_i - 1)
    def _finish():
        dw_ref[:] = dw_acc[:].astype(dw_ref.dtype)
        for gi in range(ng):
            dfreq_ref[0, gi] = dfacc[0, gi]


def _fused_bwd_sine_plain(x2d, w3d, g, freq2d, phase):
    """Plain-tier sine backward returning (dx, dw, dfreq2d), or None when
    the weight-resident tier does not fit (caller falls back to the generic
    path with the XLA dfreq expression). Pack inferred as in _fused_fwd."""
    n, nin_p = x2d.shape
    ng, nin, out = w3d.shape
    pack = nin_p // nin
    f = ng * nin
    db = jnp.dtype(_dot_dtype(x2d, w3d)).itemsize
    stream = 2 * (
        _round_up(nin_p, 128) * 2 * x2d.dtype.itemsize
        + _round_up(pack * out, 128) * x2d.dtype.itemsize
    )
    pick = _pick_row_block(nin, out, ng, n_temps=3,
                           w_bytes=w3d.dtype.itemsize, with_dw=True,
                           scr_bytes=db, stream_bytes=stream, pack=pack)
    if pick < 32:  # weight-resident tier does not fit (fit test pre-N-cap)
        return None
    bn = min(pick, _round_up(n, 8))
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    gp = jnp.pad(g, ((0, np_ - n), (0, 0)))
    w2d = w3d.reshape(f, out)
    dx, dw2d, dfreq = pl.pallas_call(
        functools.partial(_bwd_kernel_sine, nin=nin, ng=ng, pack=pack),
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, nin_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bn, pack * out), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            _smem_spec(freq2d),
            _full_vmem_spec(phase),
        ],
        out_specs=[
            pl.BlockSpec((bn, nin_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ng), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, nin_p), x2d.dtype),
            jax.ShapeDtypeStruct((f, out), w3d.dtype),
            jax.ShapeDtypeStruct((1, ng), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, pack * f), _dot_dtype(x2d, w3d)),
            pltpu.VMEM((f, out), jnp.float32),
            pltpu.SMEM((1, ng), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w2d, gp, freq2d, phase)
    return dx[:n], dw2d.reshape(ng, nin, out), dfreq.astype(freq2d.dtype)


# ---------------------------------------------------------------------------
# K-blocked streaming tier (wide-grid lazy families: sine/fourier mappers)
# ---------------------------------------------------------------------------
#
# The grid-28 trig mappers (sine in=768 ng=28, fourier ng=56 — reference
# models/sinekan.py:72, models/nfkan.py:36-52) have F = ng*in up to 43k: the
# (F, out) weight exceeds every weight-resident tier, and the out-blocked
# tier recomputes the transcendental basis once per out slab (measured
# loss vs XLA). This tier adds a second grid axis over BASIS-SLICE blocks
# instead: each (row block, k) step computes the gb slices of block k once,
# streams the (gb*in, out) weight slab, and accumulates y (or dx) in a
# VMEM scratch that lives across the k axis (k innermost). Each basis
# element is computed exactly once per pass; the basis and the full weight
# never touch HBM together. dw runs as a separate kernel with the grid
# transposed (rows innermost) so each (gb*in, out) f32 dw block stays
# resident while all rows accumulate into it. Lazy families only: their
# ``setup`` holds no per-ng state, so re-running it per k step is free.
#
# Extras (freq/phase/hk) stay FULL-resident — they are tiny (<=100KB) and
# Mosaic's block rule forbids k-blocking them (a (gb,) lane block is
# neither 128-divisible nor the full dim). The kernels wrap each extra ref
# in an ``_OffsetRef`` view that adds the traced ``k*gb`` offset, so the
# family closures keep indexing with the LOCAL slice id — sine's closures
# work unchanged; fourier needs the interleaved variant below (its cos/sin
# switch tests the global id, and parity survives the offset only when gb
# is even).


class _OffsetRef:
    """k-blocked view over a full (ng, ...) extra ref: presents the two
    indexing patterns the families use — ``[0, gi]`` (SMEM row vector,
    ``axis=1``) and ``[gi, :]`` (VMEM rows, ``axis=0``; returns a (1, n)
    row, which broadcasts identically to the (n,) the blocked ref gave)."""

    def __init__(self, ref, off, axis):
        self.ref, self.off, self.axis = ref, off, axis

    def __getitem__(self, idx):
        if self.axis == 1:
            z, gi = idx
            return self.ref[z, self.off + gi]
        gi, _ = idx
        return self.ref[pl.ds(self.off + gi, 1), :]


def fourier_family_kb(grid_size: int) -> Family:
    """Fourier with INTERLEAVED slice order [cos1, sin1, cos2, sin2, ...]
    so a k-block's local parity equals the global parity (gb is kept even)
    and the harmonic multiplier rides a k-blocked SMEM vector ``hk``."""

    def setup(x, hk_ref):
        return {"x": x, "hk": hk_ref}

    def basis(ctx, li):
        m = ctx["hk"][0, li]
        a = m * ctx["x"]
        return jnp.cos(a) if li % 2 == 0 else jnp.sin(a)

    def basis_grad(ctx, li):
        m = ctx["hk"][0, li]
        a = m * ctx["x"]
        if li % 2 == 0:
            return jnp.cos(a), -m * jnp.sin(a)
        return jnp.sin(a), m * jnp.cos(a)

    return Family(2 * grid_size, setup, basis, basis_grad, lazy=True)


def _fourier_interleave(grid_size: int):
    """Permutation (ng,) mapping [cos1..cosG, sin1..sinG] -> interleaved."""
    idx = []
    for h in range(grid_size):
        idx += [h, grid_size + h]
    return jnp.array(idx)


# --- fourier kb via the harmonic angle-addition recurrence ------------------
#
# Fourier's harmonics are consecutive integers (cos kx / sin kx, k = 1..G —
# reference nfkan.py:44-48), so the whole basis follows from ONE cos/sin
# pair by angle addition:  c_{k+1} = c_k c_1 - s_k s_1,
# s_{k+1} = s_k c_1 + c_k s_1  — 6 VPU mul/adds per harmonic instead of a
# ~20-cycle transcendental per slice. That recompute bill is exactly why
# the generic kb tier measured SLOWER than XLA for fourier (184.3 vs 145.9
# ms op-level at the grid-28 mapper): each of fwd/dx/dw re-evaluated 56
# sin/cos per element per pass. These specializations bring that to 2
# transcendentals per element for the whole fwd pass (c_1, s_1 once, state
# carried across k steps in a VMEM scratch), ZERO for dx (the derivative
# -k sin / k cos reads the same carried pair), and 4 per (k, row-block)
# step for dw (the transposed grid re-enters rows per k, so each step
# re-seeds from a direct evaluation at the block's first harmonic).
# f32 recurrence drift over 28 steps is ~1e-6 relative — far below the
# bf16 dot noise. (Sine CANNOT use this: its per-slice frequencies are
# trainable and arbitrary after the first update, sinekan.py:65-70.)

def _trig_state_init(trig, x):
    c1, s1 = jnp.cos(x), jnp.sin(x)
    nin = x.shape[1]
    trig[:, :nin] = c1
    trig[:, nin : 2 * nin] = s1
    trig[:, 2 * nin : 3 * nin] = c1
    trig[:, 3 * nin :] = s1


def _trig_state_read(trig, nin):
    return (trig[:, :nin], trig[:, nin : 2 * nin],
            trig[:, 2 * nin : 3 * nin], trig[:, 3 * nin :])


def _fwd_kernel_kbf(x_ref, w_ref, hk_ref, y_ref, basis_scr, acc, trig,
                    *, nin, gb):
    del hk_ref  # harmonic ids are implicit in the carried recurrence state
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        _trig_state_init(trig, x_ref[:].astype(jnp.float32))

    c1, s1, ch, sh = _trig_state_read(trig, nin)
    for j in range(gb // 2):
        basis_scr[:, (2 * j) * nin : (2 * j + 1) * nin] = ch.astype(
            basis_scr.dtype
        )
        basis_scr[:, (2 * j + 1) * nin : (2 * j + 2) * nin] = sh.astype(
            basis_scr.dtype
        )
        ch, sh = ch * c1 - sh * s1, sh * c1 + ch * s1
    trig[:, 2 * nin : 3 * nin] = ch
    trig[:, 3 * nin :] = sh
    acc[:] += jax.lax.dot_general(
        basis_scr[:], w_ref[:].astype(basis_scr.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == pl.num_programs(1) - 1)
    def _finish():
        y_ref[:] = acc[:].astype(y_ref.dtype)


def _dx_kernel_kbf(x_ref, w_ref, g_ref, hk_ref, dx_ref, acc, trig, *, nin, gb):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        _trig_state_init(trig, x_ref[:].astype(jnp.float32))

    gout = g_ref[:]
    gw = jax.lax.dot_general(
        gout, w_ref[:].astype(gout.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, gb*nin) f32
    c1, s1, ch, sh = _trig_state_read(trig, nin)
    for j in range(gb // 2):
        m = hk_ref[0, k * gb + 2 * j]
        # d cos(mx)/dx = -m sin(mx); d sin(mx)/dx = m cos(mx)
        acc[:] += m * (
            gw[:, (2 * j + 1) * nin : (2 * j + 2) * nin] * ch
            - gw[:, (2 * j) * nin : (2 * j + 1) * nin] * sh
        )
        ch, sh = ch * c1 - sh * s1, sh * c1 + ch * s1
    trig[:, 2 * nin : 3 * nin] = ch
    trig[:, 3 * nin :] = sh

    @pl.when(k == pl.num_programs(1) - 1)
    def _finish():
        dx_ref[:] = acc[:].astype(dx_ref.dtype)


def _dw_kernel_kbf(x_ref, g_ref, hk_ref, dw_ref, basis_scr, *, nin, gb):
    # Grid (k, rows), rows innermost (dw block resident per k): the row
    # block changes every step, so the state re-seeds by direct evaluation
    # at the block's first harmonic instead of riding a carry.
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    x = x_ref[:].astype(jnp.float32)
    c1, s1 = jnp.cos(x), jnp.sin(x)
    a0 = hk_ref[0, pl.program_id(0) * gb] * x
    ch, sh = jnp.cos(a0), jnp.sin(a0)
    for j in range(gb // 2):
        basis_scr[:, (2 * j) * nin : (2 * j + 1) * nin] = ch.astype(
            basis_scr.dtype
        )
        basis_scr[:, (2 * j + 1) * nin : (2 * j + 2) * nin] = sh.astype(
            basis_scr.dtype
        )
        ch, sh = ch * c1 - sh * s1, sh * c1 + ch * s1
    dw_ref[:] += jax.lax.dot_general(
        basis_scr[:], g_ref[:].astype(basis_scr.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel_kb(*refs, family, nin, gb, extra_axes):
    x_ref, w_ref, *extra_refs, y_ref, basis_scr, acc = refs
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[:].astype(jnp.float32)
    ctx = family.setup(x, *(
        _OffsetRef(r, k * gb, a) for r, a in zip(extra_refs, extra_axes)
    ))
    for li in range(gb):
        basis_scr[:, li * nin : (li + 1) * nin] = family.basis(ctx, li).astype(
            basis_scr.dtype
        )
    acc[:] += jax.lax.dot_general(
        basis_scr[:], w_ref[:].astype(basis_scr.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == pl.num_programs(1) - 1)
    def _finish():
        y_ref[:] = acc[:].astype(y_ref.dtype)


def _fwd_kernel_kb_basis(*refs, family, nin, gb, extra_axes):
    """kb forward that also EMITS the basis to HBM (the sine split-residual
    strategy): the (bn, gb*nin) out block doubles as the basis scratch —
    same VMEM footprint as _fwd_kernel_kb, one extra HBM write."""
    x_ref, w_ref, *extra_refs, y_ref, b_ref, acc = refs
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[:].astype(jnp.float32)
    ctx = family.setup(x, *(
        _OffsetRef(r, k * gb, a) for r, a in zip(extra_refs, extra_axes)
    ))
    for li in range(gb):
        b_ref[:, li * nin : (li + 1) * nin] = family.basis(ctx, li).astype(
            b_ref.dtype
        )
    acc[:] += jax.lax.dot_general(
        b_ref[:], w_ref[:].astype(b_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == pl.num_programs(1) - 1)
    def _finish():
        y_ref[:] = acc[:].astype(y_ref.dtype)


def _dw_kernel_kb_sine_res(x_ref, w_ref, g_ref, b_ref, freq_ref, phase_ref,
                           dw_ref, dfreq_ref, dfacc, *, nin, gb):
    """Sine dw + dfreq reading the forward's sin-basis residual: the dw
    contraction streams the stored slabs instead of recomputing 1.08B sins
    (the bwd pass's other transcendental, cos for dfreq, is irreducible —
    there is no pointwise map from sin(a) to cos(a))."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        for li in range(gb):
            dfacc[0, li] = 0.0

    off = pl.program_id(0) * gb
    x = x_ref[:].astype(jnp.float32)
    gout = g_ref[:]
    gw = jax.lax.dot_general(
        gout, w_ref[:].astype(gout.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, gb*nin) f32
    for li in range(gb):
        a = x * freq_ref[0, off + li] + phase_ref[pl.ds(off + li, 1), :]
        dfacc[0, li] += jnp.sum(
            gw[:, li * nin : (li + 1) * nin] * x * jnp.cos(a)
        )
    dw_ref[:] += jax.lax.dot_general(
        b_ref[:], gout.astype(b_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _finish():
        for li in range(gb):
            dfreq_ref[0, 0, li] = dfacc[0, li]


def _dx_kernel_kb(*refs, family, nin, gb, extra_axes):
    x_ref, w_ref, g_ref, *extra_refs, dx_ref, acc = refs
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[:].astype(jnp.float32)
    ctx = family.setup(x, *(
        _OffsetRef(r, k * gb, a) for r, a in zip(extra_refs, extra_axes)
    ))
    gout = g_ref[:]
    gw = jax.lax.dot_general(
        gout, w_ref[:].astype(gout.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, gb*nin) f32
    for li in range(gb):
        _, db = family.basis_grad(ctx, li)
        acc[:] += gw[:, li * nin : (li + 1) * nin] * db

    @pl.when(k == pl.num_programs(1) - 1)
    def _finish():
        dx_ref[:] = acc[:].astype(dx_ref.dtype)


def _dw_kernel_kb(*refs, family, nin, gb, extra_axes):
    # Grid (k, rows), rows innermost: the (gb*nin, out) f32 dw output block
    # stays VMEM-resident across all rows of its k.
    x_ref, g_ref, *extra_refs, dw_ref, basis_scr = refs
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    x = x_ref[:].astype(jnp.float32)
    ctx = family.setup(x, *(
        _OffsetRef(r, pl.program_id(0) * gb, a)
        for r, a in zip(extra_refs, extra_axes)
    ))
    for li in range(gb):
        basis_scr[:, li * nin : (li + 1) * nin] = family.basis(ctx, li).astype(
            basis_scr.dtype
        )
    dw_ref[:] += jax.lax.dot_general(
        basis_scr[:], g_ref[:].astype(basis_scr.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dw_kernel_kb_sine(x_ref, w_ref, g_ref, freq_ref, phase_ref,
                       dw_ref, dfreq_ref, basis_scr, dfacc, *, nin, gb):
    """Sine dw + in-kernel dfreq (freq is trainable, sinekan.py:65-70).
    The XLA dfreq expression materializes the full (N, in, ng) basis-grad —
    4.3 GB at the ViT-S mapper — so here it rides the dw pass:
    ``dfreq_g = sum_{n,i} (g @ W^T)[n, g*in+i] * x[n,i] * cos(arg)``."""
    i = pl.program_id(1)
    n_i = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        for li in range(gb):
            dfacc[0, li] = 0.0

    off = pl.program_id(0) * gb
    x = x_ref[:].astype(jnp.float32)
    gout = g_ref[:]
    gw = jax.lax.dot_general(
        gout, w_ref[:].astype(gout.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, gb*nin) f32
    for li in range(gb):
        a = x * freq_ref[0, off + li] + phase_ref[pl.ds(off + li, 1), :]
        s = jnp.sin(a)
        basis_scr[:, li * nin : (li + 1) * nin] = s.astype(basis_scr.dtype)
        dfacc[0, li] += jnp.sum(
            gw[:, li * nin : (li + 1) * nin] * x * jnp.cos(a)
        )
    dw_ref[:] += jax.lax.dot_general(
        basis_scr[:], gout.astype(basis_scr.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == n_i - 1)
    def _finish():
        for li in range(gb):
            dfreq_ref[0, 0, li] = dfacc[0, li]


def _kb_bn(fixed: int, per_row: int) -> int:
    bn = (_VMEM_BUDGET - fixed) // max(per_row, 1)
    return int(min(512, (bn // 8) * 8))


def _pick_kb(nin: int, out: int, ng: int, xb: int, wb: int, db: int,
             pair: bool = False, recur: bool = False, sine: bool = False,
             allow_relaxed: bool = True):
    """(gb, bn_fwd, bn_dx, bn_dw, gb_dw) for the K-blocked tier, or None.

    Row blocks are picked PER KERNEL: the full weight streams once per row
    block in the k-inner kernels (fwd/dx), so their bn directly divides the
    dominant HBM term — a joint picker pinned to the dw kernel's larger
    fixed set (the f32 dw block) would re-stream the weight 3-4x more often.
    ``pair``: gb must stay even (fourier's interleaved cos/sin parity).
    ``recur``: charge the 4-wide f32 trig carry (fwd/dx scratch, dw temps)
    of the harmonic-recurrence kernels.

    ``gb_dw``: the dw kernel gets its OWN slab size, sized against the
    RAISED scoped-VMEM limit (``_DW_VMEM_LIMIT``; Mosaic's default 16M is
    a fraction of v5e's 128M). Measured on the ViT-S mappers
    (tools/tpu_probe_dw_slab.py, full kb bwd):

    - fourier/generic (no weight input, grid-step bound): monotone better
      with wider slabs — 54.6 ms at gb_dw=2 -> 28.5 at gb_dw=ng, where
      the whole f32 dw block sits VMEM-resident (single-buffered, the k
      grid collapses to 1) and only rows stream. Widest divisor that fits.
    - sine (streams the weight slab + builds a (bn, fk) f32 gw for the
      in-kernel dfreq, transcendental-bound): narrow slabs win — best at
      (gb_dw=4, bn=256), 65.9 vs 69.0 ms at the old coupled pick; wide
      slabs LOSE (71-75 ms at gb_dw=14)."""
    rn = _round_up(nin, 128)
    ro = _round_up(out, 128)
    trig = 4 * rn * 4 if recur else 0

    def _size(gb, joint):
        fk = gb * nin
        slab = 2 * fk * out * wb  # double-buffered weight slab
        per_fwd = (
            4 * rn * 4 + 2 * fk * db + ro * 4 + trig  # temps, basis, y acc
            + 2 * (rn * xb + ro * xb)
        )
        per_dx = (
            5 * rn * 4 + fk * 4 + trig              # temps, f32 gw, dx acc
            + 2 * (2 * rn * xb + ro * xb)
        )
        per_dw_j = (
            4 * rn * 4 + 2 * fk * db + fk * 4 + trig
            + 2 * (rn * xb + ro * xb)
        )
        bn_fwd = _kb_bn(slab, per_fwd)
        bn_dx = _kb_bn(slab, per_dx)
        bn_dw_j = _kb_bn(2 * fk * out * 4 + slab, per_dw_j)
        ok = min(bn_fwd, bn_dx, bn_dw_j) if joint else min(bn_fwd, bn_dx)
        return (gb, bn_fwd, bn_dx, bn_dw_j) if ok >= 32 else None

    gbs = tuple(g for g in (8, 4, 2)
                if not (ng % g or g >= ng or (pair and g % 2)))
    got = next((s for g in gbs if (s := _size(g, joint=True))), None)
    # Wide-out shapes (e.g. the d=768 ViT-B mappers, out=768): the JOINT
    # dw fallback (2*fk*out f32 dw + the w slab) cannot fit the default
    # 16M scoped limit at ANY slab width, but the dw kernel runs under the
    # raised _DW_VMEM_LIMIT anyway — retry on fwd/dx alone and require a
    # raised-budget gb_dw below (no joint fallback). Narrow-out shapes
    # take the joint branch first, so their picks are unchanged.
    relaxed = got is None and allow_relaxed
    if relaxed:
        # Weight re-streaming scales with n/bn (gb only sets the k-slab
        # granularity), so take the gb with the LARGEST row blocks, not
        # the first that fits.
        fits = [s for g in gbs if (s := _size(g, joint=False))]
        got = max(fits, key=lambda s: min(s[1], s[2]), default=None)
    if got is None:
        return None
    gb, bn_fwd, bn_dx, bn_dw_j = got
    if sine:
        # Narrow slabs win for sine (see docstring) but gb_dw must still
        # divide ng: _fused_bwd_kb runs ng // gb_dw grid steps and reshapes
        # dfreqk to (1, ng) — a non-divisor slab would leave tail dw rows
        # unwritten and crash the reshape. Fall back to the joint gb (a
        # divisor by construction) when neither narrow slab divides.
        cands = tuple(d for d in (4, 2) if ng % d == 0)
    else:
        cands = tuple(d for d in range(ng, 1, -1) if ng % d == 0)
    for gb_dw in cands:
        if gb_dw > ng or (pair and gb_dw % 2):
            continue
        fk = gb_dw * nin
        if sine:
            # double-buffered w slab + f32 dw out, full f32 phase; per row
            # the streamed x/g, the bd basis scratch, the f32 gw, temps.
            fixed_dw = 2 * fk * out * (4 + wb) + ng * rn * 4
            per_dw = (6 * rn * 4 + fk * (db + 4)
                      + 2 * (rn * xb + ro * xb))
            cap = 256
        else:
            bufs = 1 if gb_dw == ng else 2  # k grid of 1: no revolving
            fixed_dw = bufs * fk * out * 4
            per_dw = (6 * rn * 4 + fk * db + trig
                      + 2 * (rn * xb + ro * xb))
            if recur:
                # The unrolled recurrence spills ~4.5 row-wide f32 vectors
                # per harmonic pair to scoped VMEM (measured: 55.5M of
                # register-allocator spill slots at gb_dw=56, bn=144).
                per_dw += (9 * gb_dw * rn * 4) // 4
            cap = 256
        bn_dw = (_DW_VMEM_BUDGET - fixed_dw) // max(per_dw, 1)
        bn_dw = int(min(cap, (bn_dw // 8) * 8))
        if bn_dw >= 96:
            return gb, bn_fwd, bn_dx, bn_dw, gb_dw
    if relaxed:
        return None  # the joint fallback below doesn't fit these shapes
    # fall back to the joint sizing (fits the default 16M scoped limit)
    return gb, bn_fwd, bn_dx, bn_dw_j, gb


def _kb_eligible(nin, ng, out, xdt, wdt, pair: bool = False,
                 recur: bool = False, sine: bool = False) -> bool:
    """Shape/dtype-only probe of ``_kb_strategy`` for the dispatch gate.

    Sine only advertises JOINT-fit picks to the auto dispatch: at the
    wide-out shapes the relaxed retry unlocks (ViT-B/L mappers, out >=
    768), the sine kb kernel — which pays sin fwd + sin/cos bwd recompute
    plus the dfreq gw passes — measures a consistent ~5% BEHIND XLA's
    fused path (57.4 vs 54.1 ms at out=768 N=25088; 33.0 vs 31.6 at
    out=1024 N=12544, tools/tpu_probe_kb_wide.py), while fourier's
    recurrence kernels win decisively there (43.5 vs 74.5; 31.1 vs 41.7).
    Forced-pallas still executes the relaxed sine pick via
    ``_kb_strategy`` — far better than the out-blocked tier's per-slab
    transcendental recompute (118.6 ms at out=768)."""
    wb = jnp.dtype(wdt).itemsize
    if ng * nin * out * (wb + 4) <= _VMEM_BUDGET // 2:
        return False
    db = 2 if (jnp.dtype(xdt) == jnp.bfloat16
               and jnp.dtype(wdt) == jnp.bfloat16) else 4
    return _pick_kb(nin, out, ng, jnp.dtype(xdt).itemsize, wb, db,
                    pair=pair, recur=recur, sine=sine,
                    allow_relaxed=not sine) is not None


def _kb_strategy(x2d, w3d, pair: bool = False, recur: bool = False,
                 sine: bool = False):
    """Engage kb only where the weight-resident tiers cannot hold the full
    (F, out) weight (+ f32 dw) — i.e. where the alternative is the
    out-blocked tier's per-slab transcendental recompute or XLA's
    HBM-materialized basis."""
    n, nin = x2d.shape
    if nin != w3d.shape[1]:
        return None  # row-packed caller (narrow layer) — never a kb shape
    ng, _, out = w3d.shape
    wb = w3d.dtype.itemsize
    if ng * nin * out * (wb + 4) <= _VMEM_BUDGET // 2:
        return None
    db = jnp.dtype(_dot_dtype(x2d, w3d)).itemsize
    return _pick_kb(nin, out, ng, x2d.dtype.itemsize, wb, db, pair=pair,
                    recur=recur, sine=sine)


def _fused_fwd_kb(x2d, w3d, extras, extra_specs, extra_axes, family, gb, bn,
                  recur: bool = False):
    n, nin = x2d.shape
    ng, _, out = w3d.shape
    nk = ng // gb
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    bd = _dot_dtype(x2d, w3d)
    if recur:
        kern = functools.partial(_fwd_kernel_kbf, nin=nin, gb=gb)
        scratch_extra = [pltpu.VMEM((bn, 4 * nin), jnp.float32)]
    else:
        kern = functools.partial(_fwd_kernel_kb, family=family, nin=nin,
                                 gb=gb, extra_axes=extra_axes)
        scratch_extra = []
    y = pl.pallas_call(
        kern,
        grid=(np_ // bn, nk),
        in_specs=[
            pl.BlockSpec((bn, nin), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb * nin, out), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((bn, out), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, out), x2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((bn, gb * nin), bd),
            pltpu.VMEM((bn, out), jnp.float32),
            *scratch_extra,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w3d.reshape(ng * nin, out), *extras)
    return y[:n]


def _fused_fwd_kb_basis(x2d, w3d, extras, extra_specs, extra_axes, family,
                        gb, bn):
    """kb forward returning (y, basis-residual (np_, ng*nin) in the dot
    dtype) — the sine mapper's split strategy. Padded rows carry garbage
    basis values; the bwd pads g with zeros so they contribute nothing."""
    n, nin = x2d.shape
    ng, _, out = w3d.shape
    nk = ng // gb
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    bd = _dot_dtype(x2d, w3d)
    y, basis = pl.pallas_call(
        functools.partial(_fwd_kernel_kb_basis, family=family, nin=nin,
                          gb=gb, extra_axes=extra_axes),
        grid=(np_ // bn, nk),
        in_specs=[
            pl.BlockSpec((bn, nin), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb * nin, out), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec((bn, out), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, gb * nin), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, out), x2d.dtype),
            jax.ShapeDtypeStruct((np_, ng * nin), bd),
        ],
        scratch_shapes=[pltpu.VMEM((bn, out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w3d.reshape(ng * nin, out), *extras)
    return y[:n], basis


def _fused_bwd_kb_sine_res(x2d, w3d, g, basis, freq2d, phase, fam, gb,
                           bn_dx, bn_dw):
    """Split-residual sine kb backward: dx is the standard (DCE-able) kb
    kernel; dw streams the stored sin basis (no sin recompute) and dfreq's
    cos recompute rides the same pass. Returns (dx, dw, dfreq2d)."""
    n, nin = x2d.shape
    ng, _, out = w3d.shape
    nk = ng // gb
    bd = _dot_dtype(x2d, w3d)
    w2d = w3d.reshape(ng * nin, out)
    extras = (freq2d, phase)
    extra_specs = (_smem_spec(freq2d), _full_vmem_spec(phase))

    bn = bn_dx
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    gp = jnp.pad(g, ((0, np_ - n), (0, 0)))
    dx = pl.pallas_call(
        functools.partial(_dx_kernel_kb, family=fam, nin=nin, gb=gb,
                          extra_axes=(1, 0)),
        grid=(np_ // bn, nk),
        in_specs=[
            pl.BlockSpec((bn, nin), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb * nin, out), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, out), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((bn, nin), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, nin), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((bn, nin), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w2d, gp, *extras)

    bn = bn_dw
    np_ = _round_up(n, bn)
    # The residual was written at the FORWARD's row block; bn_fwd == bn_dw
    # is not guaranteed, but the residual's row padding is ≥ both (same
    # _round_up base n) only when blocks divide — re-pad defensively.
    basis_p = (basis if basis.shape[0] == np_
               else jnp.pad(basis[:n], ((0, np_ - n), (0, 0))))
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    gp = jnp.pad(g, ((0, np_ - n), (0, 0)))
    dw2d, dfreqk = pl.pallas_call(
        functools.partial(_dw_kernel_kb_sine_res, nin=nin, gb=gb),
        grid=(nk, np_ // bn),
        in_specs=[
            pl.BlockSpec((bn, nin), lambda k, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb * nin, out), lambda k, i: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, out), lambda k, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, gb * nin), lambda k, i: (i, k),
                         memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec((gb * nin, out), lambda k, i: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gb), lambda k, i: (k, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ng * nin, out), jnp.float32),
            jax.ShapeDtypeStruct((nk, 1, gb), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((1, gb), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_DW_VMEM_LIMIT,
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w2d, gp, basis_p, freq2d, phase)
    dw = dw2d.astype(w3d.dtype).reshape(ng, nin, out)
    return dx[:n], dw, dfreqk.reshape(1, ng).astype(freq2d.dtype)


def _fused_bwd_kb(x2d, w3d, g, extras, extra_specs, extra_axes, family, gb,
                  bn_dx, bn_dw, sine_freq_phase=None, recur: bool = False,
                  gb_dw=None):
    """dx via (rows, k) accumulation; dw via the transposed (k, rows) grid
    (each kernel gets its own row block — see ``_pick_kb``).
    ``sine_freq_phase``: (freq2d, phase) engages the sine dw kernel with
    in-kernel dfreq; returns (dx, dw[, dfreq2d]).
    ``recur``: fourier harmonic-recurrence kernels (extras must be (hk,))."""
    n, nin = x2d.shape
    ng, _, out = w3d.shape
    nk = ng // gb
    bd = _dot_dtype(x2d, w3d)
    w2d = w3d.reshape(ng * nin, out)
    bn = bn_dx
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    gp = jnp.pad(g, ((0, np_ - n), (0, 0)))  # zero rows -> zero contribs
    if recur:
        dx_kern = functools.partial(_dx_kernel_kbf, nin=nin, gb=gb)
        dx_scratch_extra = [pltpu.VMEM((bn, 4 * nin), jnp.float32)]
    else:
        dx_kern = functools.partial(_dx_kernel_kb, family=family, nin=nin,
                                    gb=gb, extra_axes=extra_axes)
        dx_scratch_extra = []
    dx = pl.pallas_call(
        dx_kern,
        grid=(np_ // bn, nk),
        in_specs=[
            pl.BlockSpec((bn, nin), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb * nin, out), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, out), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((bn, nin), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, nin), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((bn, nin), jnp.float32),
                        *dx_scratch_extra],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, w2d, gp, *extras)

    bn = bn_dw
    gbw = gb_dw or gb  # the dw kernel gets its own (larger) slab size
    nkw = ng // gbw
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    gp = jnp.pad(g, ((0, np_ - n), (0, 0)))
    if sine_freq_phase is not None:
        freq2d, phase = sine_freq_phase
        dw2d, dfreqk = pl.pallas_call(
            functools.partial(_dw_kernel_kb_sine, nin=nin, gb=gbw),
            grid=(nkw, np_ // bn),
            in_specs=[
                pl.BlockSpec((bn, nin), lambda k, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gbw * nin, out), lambda k, i: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, out), lambda k, i: (i, 0),
                             memory_space=pltpu.VMEM),
                _smem_spec(freq2d),
                _full_vmem_spec(phase),
            ],
            out_specs=[
                pl.BlockSpec((gbw * nin, out), lambda k, i: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, gbw), lambda k, i: (k, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((ng * nin, out), jnp.float32),
                jax.ShapeDtypeStruct((nkw, 1, gbw), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((bn, gbw * nin), bd),
                pltpu.SMEM((1, gbw), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=_DW_VMEM_LIMIT,
            ),
            interpret=dispatch.interpret_mode(),
        )(xp, w2d, gp, freq2d, phase)
        dw = dw2d.astype(w3d.dtype).reshape(ng, nin, out)
        return dx[:n], dw, dfreqk.reshape(1, ng).astype(freq2d.dtype)

    if recur:
        dw_kern = functools.partial(_dw_kernel_kbf, nin=nin, gb=gbw)
    else:
        dw_kern = functools.partial(_dw_kernel_kb, family=family, nin=nin,
                                    gb=gbw, extra_axes=extra_axes)
    dw2d = pl.pallas_call(
        dw_kern,
        grid=(nkw, np_ // bn),
        in_specs=[
            pl.BlockSpec((bn, nin), lambda k, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, out), lambda k, i: (i, 0),
                         memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((gbw * nin, out), lambda k, i: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng * nin, out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bn, gbw * nin), bd)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_DW_VMEM_LIMIT,
        ),
        interpret=dispatch.interpret_mode(),
    )(xp, gp, *extras)
    return dx[:n], dw2d.astype(w3d.dtype).reshape(ng, nin, out)


# ---------------------------------------------------------------------------
# Per-family custom-VJP ops over (x2d, w3d[, extras])
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _bspline_op(x2d, w3d, gridt, grid_size, spline_order, with_base=False):
    fam = bspline_family(grid_size, spline_order, with_base)
    return _fused_fwd(x2d, w3d, (gridt,), (_full_vmem_spec(gridt),), fam)


def _op_strategy(x2d, w3d):
    n, nin = x2d.shape
    if nin != w3d.shape[1]:
        # Row-packed (narrow) layer: always served by the pack-aware plain
        # tier (with a block-diagonal fallback inside _fused_bwd) — the
        # split residual path is an embedder-scale (pack=1) strategy.
        return "plain"
    ng, _, out = w3d.shape
    return _bwd_strategy(
        n, nin, ng, out, x2d.dtype.itemsize, w3d.dtype.itemsize,
        jnp.dtype(_dot_dtype(x2d, w3d)).itemsize,
    )


def _bspline_op_fwd(x2d, w3d, gridt, grid_size, spline_order, with_base=False):
    fam = bspline_family(grid_size, spline_order, with_base)
    if _op_strategy(x2d, w3d) == "split":
        y, basis = _fused_fwd_basis(
            x2d, w3d, (gridt,), (_full_vmem_spec(gridt),), fam
        )
        return y, (x2d, w3d, gridt, basis)
    return (
        _bspline_op(x2d, w3d, gridt, grid_size, spline_order, with_base),
        (x2d, w3d, gridt, None),
    )


def _bspline_op_bwd(grid_size, spline_order, with_base, res, g):
    x2d, w3d, gridt, basis = res
    fam = bspline_family(grid_size, spline_order, with_base)
    if basis is not None:
        dx, dw = _fused_bwd_split(
            x2d, w3d, g, basis, (gridt,), (_full_vmem_spec(gridt),), fam
        )
    else:
        dx, dw = _fused_bwd(
            x2d, w3d, g, (gridt,), (_full_vmem_spec(gridt),), fam
        )
    return dx, dw, jnp.zeros_like(gridt)


_bspline_op.defvjp(_bspline_op_fwd, _bspline_op_bwd)


# --- RBF with fused silu base branch (FastKAN) ------------------------------
#
# FastKAN's base branch consumes RAW x while the RBF spline consumes LN(x)
# (reference fastkan.py:66-76), so folding it into the kernel needs a second
# streamed input — the generic single-x template cannot express it. The
# dedicated op below streams (ln, x_raw) row blocks together; the silu
# slice rides the same contraction dot as the RBF slices (base_weight
# stacked as the last w3d row). Measured: the XLA-side base chains cost
# 3.1 ms/block at the ViT-S fast MSA (18 projections), ~12% of the step.

def _rbf_base_fwd_kernel(ln_ref, xr_ref, w_ref, grid_ref, y_ref, basis_scr,
                         *, ng, denominator, nin):
    ln = ln_ref[:].astype(jnp.float32)
    for gi, b, _ in _rbf_recur(ln, grid_ref, denominator, ng):
        basis_scr[:, gi * nin : (gi + 1) * nin] = b.astype(basis_scr.dtype)
    xr = xr_ref[:].astype(jnp.float32)
    basis_scr[:, ng * nin :] = (xr * jax.nn.sigmoid(xr)).astype(basis_scr.dtype)
    y_ref[:] = jax.lax.dot_general(
        basis_scr[:], w_ref[:].astype(basis_scr.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y_ref.dtype)


def _rbf_base_bwd_kernel(ln_ref, xr_ref, w_ref, g_ref, grid_ref,
                         dln_ref, dxr_ref, dw_ref, basis_scr, dw_acc,
                         *, ng, denominator, nin):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dw_acc[:] = jnp.zeros_like(dw_acc)

    ln = ln_ref[:].astype(jnp.float32)
    xr = xr_ref[:].astype(jnp.float32)
    gout = g_ref[:]
    gw = jax.lax.dot_general(
        gout, w_ref[:].astype(gout.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, F) f32
    dln = jnp.zeros(ln.shape, jnp.float32)
    for gi, b, u in _rbf_recur(ln, grid_ref, denominator, ng):
        basis_scr[:, gi * nin : (gi + 1) * nin] = b.astype(basis_scr.dtype)
        dln += gw[:, gi * nin : (gi + 1) * nin] * ((-2.0 / denominator) * u * b)
    sig = jax.nn.sigmoid(xr)
    s = xr * sig
    basis_scr[:, ng * nin :] = s.astype(basis_scr.dtype)
    dxr = gw[:, ng * nin :] * (sig + s * (1.0 - sig))
    dln_ref[:] = dln.astype(dln_ref.dtype)
    dxr_ref[:] = dxr.astype(dxr_ref.dtype)
    dw_acc[:] += jax.lax.dot_general(
        basis_scr[:], gout.astype(basis_scr.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == n_i - 1)
    def _finish():
        dw_ref[:] = dw_acc[:].astype(dw_ref.dtype)


def _rbf_base_bn(n, nin, ng1, out, x2d, w3d, with_dw):
    db = jnp.dtype(_dot_dtype(x2d, w3d)).itemsize
    xb = x2d.dtype.itemsize
    # Two streamed row inputs (ln + raw x), plus g/dln/dxr on the bwd side.
    stream = 2 * (
        (4 if with_dw else 2) * _round_up(nin, 128) * xb
        + _round_up(out, 128) * xb
    )
    return _pick_row_block(
        nin, out, ng1, n_temps=3, w_bytes=w3d.dtype.itemsize,
        with_dw=with_dw, scr_bytes=db, stream_bytes=stream, per_g=False,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _rbf_base_op(ln2d, xr2d, w3d, grid2d, num_grids, denominator):
    n, nin = ln2d.shape
    ng1, _, out = w3d.shape  # num_grids + 1 (silu slice last)
    f = ng1 * nin
    bn = min(_rbf_base_bn(n, nin, ng1, out, ln2d, w3d, False),
             _round_up(n, 8))
    np_ = _round_up(n, bn)
    lnp = jnp.pad(ln2d, ((0, np_ - n), (0, 0)))
    xrp = jnp.pad(xr2d, ((0, np_ - n), (0, 0)))
    aug2d = _rbf_aug(grid2d, denominator)
    y = pl.pallas_call(
        functools.partial(
            _rbf_base_fwd_kernel, ng=num_grids, denominator=denominator,
            nin=nin,
        ),
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, nin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, nin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            _smem_spec(aug2d),
        ],
        out_specs=pl.BlockSpec((bn, out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, out), ln2d.dtype),
        scratch_shapes=[pltpu.VMEM((bn, f), _dot_dtype(ln2d, w3d))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=dispatch.interpret_mode(),
    )(lnp, xrp, w3d.reshape(f, out), aug2d)
    return y[:n]


def _rbf_base_op_fwd(ln2d, xr2d, w3d, grid2d, num_grids, denominator):
    return (
        _rbf_base_op(ln2d, xr2d, w3d, grid2d, num_grids, denominator),
        (ln2d, xr2d, w3d, grid2d),
    )


def _rbf_base_op_bwd(num_grids, denominator, res, g):
    ln2d, xr2d, w3d, grid2d = res
    n, nin = ln2d.shape
    ng1, _, out = w3d.shape
    f = ng1 * nin
    bn = min(_rbf_base_bn(n, nin, ng1, out, ln2d, w3d, True),
             _round_up(n, 8))
    np_ = _round_up(n, bn)
    lnp = jnp.pad(ln2d, ((0, np_ - n), (0, 0)))
    xrp = jnp.pad(xr2d, ((0, np_ - n), (0, 0)))
    gp = jnp.pad(g, ((0, np_ - n), (0, 0)))  # zero rows -> zero dw contrib
    aug2d = _rbf_aug(grid2d, denominator)
    dln, dxr, dw2d = pl.pallas_call(
        functools.partial(
            _rbf_base_bwd_kernel, ng=num_grids, denominator=denominator,
            nin=nin,
        ),
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, nin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, nin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _smem_spec(aug2d),
        ],
        out_specs=[
            pl.BlockSpec((bn, nin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, nin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, nin), ln2d.dtype),
            jax.ShapeDtypeStruct((np_, nin), xr2d.dtype),
            jax.ShapeDtypeStruct((f, out), w3d.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, f), _dot_dtype(ln2d, w3d)),
            pltpu.VMEM((f, out), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=dispatch.interpret_mode(),
    )(lnp, xrp, w3d.reshape(f, out), gp, aug2d)
    return (
        dln[:n], dxr[:n], dw2d.reshape(ng1, nin, out),
        jnp.zeros_like(grid2d),
    )


_rbf_base_op.defvjp(_rbf_base_op_fwd, _rbf_base_op_bwd)


# --- RBF with fused LayerNorm + silu base branch (FastKAN) -------------------
#
# FastKANLayer normalizes x INSIDE the layer before the RBF expansion
# (reference fastkan.py:66-70). Keeping that LayerNorm on the XLA side of
# the custom VJP costs a separate HBM round trip per projection — measured
# ~0.7 ms/block at the ViT-S fast MSA (18 LN chains fwd+bwd) — and forces
# the dual-input op above to stream BOTH ln(x) and raw x. This op streams
# only raw x and computes the LN (and its VJP) in-kernel.
#
# Row packing puts p consecutive rows side by side in each 128-lane kernel
# row, so the LN statistics must be per lane GROUP (seg = the original
# feature width). Mosaic cannot lower minor-dim reshapes, but 2-D slices at
# seg granularity lower fine (the basis writes already rely on this), so
# the segment loop computes each group's mean/rstd with lane reductions and
# writes the normalized slice into a VMEM scratch.

def _seg_ln_into(xr, gam, bet, seg, ln_scr, xhat_scr):
    """Segment-wise LayerNorm (eps follows kan_bases.layernorm / the
    reference's nn.LayerNorm default, 1e-5). Writes x-hat and ln into the
    provided scratches; returns the per-segment rstd list for the VJP."""
    rstds = []
    for r in range(xr.shape[1] // seg):
        sl = slice(r * seg, (r + 1) * seg)
        xs = xr[:, sl]
        m = jnp.mean(xs, axis=1, keepdims=True)
        xc = xs - m
        v = jnp.mean(xc * xc, axis=1, keepdims=True)
        rstd = jax.lax.rsqrt(v + 1e-5)
        xh = xc * rstd
        if xhat_scr is not None:
            xhat_scr[:, sl] = xh
        ln_scr[:, sl] = xh * gam[:, sl] + bet[:, sl]
        rstds.append(rstd)
    return rstds


def _rbf_ln_fwd_kernel(xr_ref, w_ref, gam_ref, bet_ref, grid_ref, y_ref,
                       basis_scr, ln_scr, *, ng, denominator, nin, seg):
    xr = xr_ref[:].astype(jnp.float32)
    _seg_ln_into(xr, gam_ref[:].astype(jnp.float32),
                 bet_ref[:].astype(jnp.float32), seg, ln_scr, None)
    ln = ln_scr[:]
    for gi, b, _ in _rbf_recur(ln, grid_ref, denominator, ng):
        basis_scr[:, gi * nin : (gi + 1) * nin] = b.astype(basis_scr.dtype)
    basis_scr[:, ng * nin :] = (xr * jax.nn.sigmoid(xr)).astype(basis_scr.dtype)
    y_ref[:] = jax.lax.dot_general(
        basis_scr[:], w_ref[:].astype(basis_scr.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y_ref.dtype)


def _rbf_ln_bwd_kernel(xr_ref, w_ref, g_ref, gam_ref, bet_ref, grid_ref,
                       dx_ref, dw_ref, dgam_ref, dbet_ref,
                       basis_scr, ln_scr, xhat_scr, dw_acc, dgb_acc,
                       *, ng, denominator, nin, seg):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dw_acc[:] = jnp.zeros_like(dw_acc)
        dgb_acc[:] = jnp.zeros_like(dgb_acc)

    xr = xr_ref[:].astype(jnp.float32)
    gam = gam_ref[:].astype(jnp.float32)
    rstds = _seg_ln_into(xr, gam, bet_ref[:].astype(jnp.float32), seg,
                         ln_scr, xhat_scr)
    ln = ln_scr[:]
    xhat = xhat_scr[:]
    gout = g_ref[:]
    gw = jax.lax.dot_general(
        gout, w_ref[:].astype(gout.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, F) f32
    dln = jnp.zeros(xr.shape, jnp.float32)
    for gi, b, u in _rbf_recur(ln, grid_ref, denominator, ng):
        basis_scr[:, gi * nin : (gi + 1) * nin] = b.astype(basis_scr.dtype)
        dln += gw[:, gi * nin : (gi + 1) * nin] * ((-2.0 / denominator) * u * b)
    sig = jax.nn.sigmoid(xr)
    s = xr * sig
    basis_scr[:, ng * nin :] = s.astype(basis_scr.dtype)
    dx_silu = gw[:, ng * nin :] * (sig + s * (1.0 - sig))

    # LN VJP. Padded tail rows carry zero cotangents, so their (finite)
    # x-hat contributes nothing to dgamma/dbeta or dx.
    dgb_acc[0:1, :] += jnp.sum(dln * xhat, axis=0, keepdims=True)
    dgb_acc[1:2, :] += jnp.sum(dln, axis=0, keepdims=True)
    gxh = dln * gam
    for r in range(xr.shape[1] // seg):
        sl = slice(r * seg, (r + 1) * seg)
        gs = gxh[:, sl]
        xh = xhat[:, sl]
        m1 = jnp.mean(gs, axis=1, keepdims=True)
        m2 = jnp.mean(gs * xh, axis=1, keepdims=True)
        dx_ref[:, sl] = (
            rstds[r] * (gs - m1 - xh * m2) + dx_silu[:, sl]
        ).astype(dx_ref.dtype)

    dw_acc[:] += jax.lax.dot_general(
        basis_scr[:], gout.astype(basis_scr.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == n_i - 1)
    def _finish():
        dw_ref[:] = dw_acc[:].astype(dw_ref.dtype)
        dgam_ref[:] = dgb_acc[0:1, :].astype(dgam_ref.dtype)
        dbet_ref[:] = dgb_acc[1:2, :].astype(dbet_ref.dtype)


def _rbf_ln_bn(n, nin, ng1, out, x2d, w3d, with_dw):
    db = jnp.dtype(_dot_dtype(x2d, w3d)).itemsize
    xb = x2d.dtype.itemsize
    # One streamed row input (raw x) + outputs; the ln / x-hat scratches and
    # the LN temps ride as extra per-row (bn, nin) f32 arrays.
    stream = 2 * (
        (2 if with_dw else 1) * _round_up(nin, 128) * xb
        + _round_up(out, 128) * xb
    )
    return _pick_row_block(
        nin, out, ng1, n_temps=(6 if with_dw else 4),
        w_bytes=w3d.dtype.itemsize, with_dw=with_dw, scr_bytes=db,
        stream_bytes=stream, per_g=False,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _rbf_ln_base_op(xr2d, gam2d, bet2d, w3d, grid2d, num_grids, denominator,
                    seg):
    n, nin = xr2d.shape
    ng1, _, out = w3d.shape  # num_grids + 1 (silu slice last)
    f = ng1 * nin
    bn = min(_rbf_ln_bn(n, nin, ng1, out, xr2d, w3d, False),
             _round_up(n, 8))
    np_ = _round_up(n, bn)
    xrp = jnp.pad(xr2d, ((0, np_ - n), (0, 0)))
    aug2d = _rbf_aug(grid2d, denominator)
    y = pl.pallas_call(
        functools.partial(
            _rbf_ln_fwd_kernel, ng=num_grids, denominator=denominator,
            nin=nin, seg=seg,
        ),
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, nin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            _smem_spec(aug2d),
        ],
        out_specs=pl.BlockSpec((bn, out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, out), xr2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((bn, f), _dot_dtype(xr2d, w3d)),
            pltpu.VMEM((bn, nin), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=dispatch.interpret_mode(),
    )(xrp, w3d.reshape(f, out), gam2d, bet2d, aug2d)
    return y[:n]


def _rbf_ln_base_op_fwd(xr2d, gam2d, bet2d, w3d, grid2d, num_grids,
                        denominator, seg):
    return (
        _rbf_ln_base_op(xr2d, gam2d, bet2d, w3d, grid2d, num_grids,
                        denominator, seg),
        (xr2d, gam2d, bet2d, w3d, grid2d),
    )


def _rbf_ln_base_op_bwd(num_grids, denominator, seg, res, g):
    xr2d, gam2d, bet2d, w3d, grid2d = res
    n, nin = xr2d.shape
    ng1, _, out = w3d.shape
    f = ng1 * nin
    bn = min(_rbf_ln_bn(n, nin, ng1, out, xr2d, w3d, True),
             _round_up(n, 8))
    np_ = _round_up(n, bn)
    xrp = jnp.pad(xr2d, ((0, np_ - n), (0, 0)))
    gp = jnp.pad(g, ((0, np_ - n), (0, 0)))  # zero rows -> zero contributions
    aug2d = _rbf_aug(grid2d, denominator)
    dx, dw2d, dgam, dbet = pl.pallas_call(
        functools.partial(
            _rbf_ln_bwd_kernel, ng=num_grids, denominator=denominator,
            nin=nin, seg=seg,
        ),
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, nin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            _smem_spec(aug2d),
        ],
        out_specs=[
            pl.BlockSpec((bn, nin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nin), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, nin), xr2d.dtype),
            jax.ShapeDtypeStruct((f, out), w3d.dtype),
            jax.ShapeDtypeStruct((1, nin), gam2d.dtype),
            jax.ShapeDtypeStruct((1, nin), bet2d.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, f), _dot_dtype(xr2d, w3d)),
            pltpu.VMEM((bn, nin), jnp.float32),
            pltpu.VMEM((bn, nin), jnp.float32),
            pltpu.VMEM((f, out), jnp.float32),
            pltpu.VMEM((2, nin), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=dispatch.interpret_mode(),
    )(xrp, w3d.reshape(f, out), gp, gam2d, bet2d, aug2d)
    return (
        dx[:n], dgam, dbet, dw2d.reshape(ng1, nin, out),
        jnp.zeros_like(grid2d),
    )


_rbf_ln_base_op.defvjp(_rbf_ln_base_op_fwd, _rbf_ln_base_op_bwd)


# --- slot-grouped FastKAN projection (heads as slots) ------------------------
#
# The fast MSA analogue of the slot-grouped qkv tier: q/k/v cannot share a
# basis (each projection applies its own LN affine before the RBF,
# fastkan.py:66-70), but each PROJECTION can still run as one kernel over
# all heads straight off the (B*T, H*dh) activation — per-head LN rides the
# existing segment mechanism (seg = dh), per-head weights ride sublane-
# stacked slot weights with slice dots (which also replaces the vmapped
# path's block-diagonal packed weight, halving the dot MACs).

def _rbf_ln_fwd_kernel_sg(xr_ref, w_ref, gam_ref, bet_ref, grid_ref, y_ref,
                          basis_scr, ln_scr, *, ng, denominator, seg, qslots):
    f = (ng + 1) * seg
    out = w_ref.shape[1]
    xr = xr_ref[:].astype(jnp.float32)
    _seg_ln_into(xr, gam_ref[:].astype(jnp.float32),
                 bet_ref[:].astype(jnp.float32), seg, ln_scr, None)
    ln = ln_scr[:]
    for gi, bf, _ in _rbf_recur(ln, grid_ref, denominator, ng):
        b = bf.astype(basis_scr.dtype)
        for r in range(qslots):
            basis_scr[:, r * f + gi * seg : r * f + (gi + 1) * seg] = (
                b[:, r * seg : (r + 1) * seg]
            )
    s = (xr * jax.nn.sigmoid(xr)).astype(basis_scr.dtype)
    for r in range(qslots):
        basis_scr[:, r * f + ng * seg : (r + 1) * f] = (
            s[:, r * seg : (r + 1) * seg]
        )
    w = w_ref[:].astype(basis_scr.dtype)
    for r in range(qslots):
        y_ref[:, r * out : (r + 1) * out] = jax.lax.dot_general(
            basis_scr[:, r * f : (r + 1) * f], w[r * f : (r + 1) * f],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(y_ref.dtype)


def _rbf_ln_bwd_kernel_sg(xr_ref, w_ref, g_ref, gam_ref, bet_ref, grid_ref,
                          dx_ref, dw_ref, dgam_ref, dbet_ref,
                          basis_scr, ln_scr, xhat_scr, dw_acc, dgb_acc,
                          *, ng, denominator, seg, qslots):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        dw_acc[:] = jnp.zeros_like(dw_acc)
        dgb_acc[:] = jnp.zeros_like(dgb_acc)

    f = (ng + 1) * seg
    out = w_ref.shape[1]
    xr = xr_ref[:].astype(jnp.float32)
    gam = gam_ref[:].astype(jnp.float32)
    rstds = _seg_ln_into(xr, gam, bet_ref[:].astype(jnp.float32), seg,
                         ln_scr, xhat_scr)
    ln = ln_scr[:]
    xhat = xhat_scr[:]
    gout = g_ref[:]
    w = w_ref[:].astype(gout.dtype)
    gws = [
        jax.lax.dot_general(
            gout[:, r * out : (r + 1) * out], w[r * f : (r + 1) * f],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (bn, f) f32
        for r in range(qslots)
    ]
    dlns = [jnp.zeros((xr.shape[0], seg), jnp.float32) for _ in range(qslots)]
    for gi, b, u in _rbf_recur(ln, grid_ref, denominator, ng):
        coef = (-2.0 / denominator) * u * b
        bd = b.astype(basis_scr.dtype)
        for r in range(qslots):
            basis_scr[:, r * f + gi * seg : r * f + (gi + 1) * seg] = (
                bd[:, r * seg : (r + 1) * seg]
            )
            dlns[r] += (gws[r][:, gi * seg : (gi + 1) * seg]
                        * coef[:, r * seg : (r + 1) * seg])
    sig = jax.nn.sigmoid(xr)
    s = xr * sig
    dsilu = sig + s * (1.0 - sig)
    sd = s.astype(basis_scr.dtype)
    for r in range(qslots):
        basis_scr[:, r * f + ng * seg : (r + 1) * f] = (
            sd[:, r * seg : (r + 1) * seg]
        )
    dln = (dlns[0] if qslots == 1
           else jnp.concatenate(dlns, axis=1))  # (bn, qslots*seg)

    # LN VJP (padded tail rows carry zero cotangents).
    dgb_acc[0:1, :] += jnp.sum(dln * xhat, axis=0, keepdims=True)
    dgb_acc[1:2, :] += jnp.sum(dln, axis=0, keepdims=True)
    gxh = dln * gam
    for r in range(qslots):
        sl = slice(r * seg, (r + 1) * seg)
        gs = gxh[:, sl]
        xh = xhat[:, sl]
        m1 = jnp.mean(gs, axis=1, keepdims=True)
        m2 = jnp.mean(gs * xh, axis=1, keepdims=True)
        dx_silu = gws[r][:, ng * seg :] * dsilu[:, sl]
        dx_ref[:, sl] = (
            rstds[r] * (gs - m1 - xh * m2) + dx_silu
        ).astype(dx_ref.dtype)

    for r in range(qslots):
        dw_acc[r * f : (r + 1) * f, :] += jax.lax.dot_general(
            basis_scr[:, r * f : (r + 1) * f],
            gout[:, r * out : (r + 1) * out].astype(basis_scr.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    @pl.when(i == n_i - 1)
    def _finish():
        dw_ref[:] = dw_acc[:].astype(dw_ref.dtype)
        dgam_ref[:] = dgb_acc[0:1, :].astype(dgam_ref.dtype)
        dbet_ref[:] = dgb_acc[1:2, :].astype(dbet_ref.dtype)


def _rbf_ln_sg_bn(seg, ng1, out, x2d, w_sg, qslots, with_dw):
    db = jnp.dtype(_dot_dtype(x2d, w_sg)).itemsize
    xb = x2d.dtype.itemsize
    stream = 2 * (
        (2 if with_dw else 1) * _round_up(qslots * seg, 128) * xb
        + _round_up(qslots * out, 128) * xb
    )
    # n_temps is calibrated against Mosaic's measured stack allocation at the
    # ViT-S fast qkv shape (seg=64, ng=8, qslots=2 — _sg_slots caps q at
    # 128//seg): the bwd's live f32 set
    # (xr/ln/xhat/gxh/sig/s/dsilu/u/b/coef/dln + per-slot dlns and the
    # scheduler's double buffers) costs ~20 (bn, q*seg) tiles — the first
    # model (6) compiled to 17.2M scoped vmem against the 16M limit.
    return _RBF_SG_BN_SCALE * _pick_row_block(
        seg, out, ng1, n_temps=(20 if with_dw else 8),
        w_bytes=w_sg.dtype.itemsize, with_dw=with_dw, scr_bytes=db,
        stream_bytes=stream, per_g=False, pack=qslots, slot_w=True,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _rbf_ln_sg_op(xr2d, gam2d, bet2d, w_sg, grid2d, num_grids, denominator,
                  seg, qslots):
    n, d_all = xr2d.shape
    groups = d_all // seg
    f = (num_grids + 1) * seg
    out = w_sg.shape[1]
    bn = min(_rbf_ln_sg_bn(seg, num_grids + 1, out, xr2d, w_sg, qslots,
                           False),
             _round_up(n, 8))
    np_ = _round_up(n, bn)
    xrp = jnp.pad(xr2d, ((0, np_ - n), (0, 0)))
    aug2d = _rbf_aug(grid2d, denominator)
    y = pl.pallas_call(
        functools.partial(
            _rbf_ln_fwd_kernel_sg, ng=num_grids, denominator=denominator,
            seg=seg, qslots=qslots,
        ),
        grid=(groups // qslots, np_ // bn),
        in_specs=[
            pl.BlockSpec((bn, qslots * seg), lambda hp, i: (i, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qslots * f, out), lambda hp, i: (hp, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qslots * seg), lambda hp, i: (0, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qslots * seg), lambda hp, i: (0, hp),
                         memory_space=pltpu.VMEM),
            _smem_spec(aug2d),
        ],
        out_specs=pl.BlockSpec((bn, qslots * out), lambda hp, i: (i, hp),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, groups * out), xr2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((bn, qslots * f), _dot_dtype(xr2d, w_sg)),
            pltpu.VMEM((bn, qslots * seg), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_RBF_SG_VMEM_LIMIT,
        ),
        interpret=dispatch.interpret_mode(),
    )(xrp, w_sg, gam2d, bet2d, aug2d)
    return y[:n]


def _rbf_ln_sg_op_fwd(xr2d, gam2d, bet2d, w_sg, grid2d, num_grids,
                      denominator, seg, qslots):
    return (
        _rbf_ln_sg_op(xr2d, gam2d, bet2d, w_sg, grid2d, num_grids,
                      denominator, seg, qslots),
        (xr2d, gam2d, bet2d, w_sg, grid2d),
    )


def _rbf_ln_sg_op_bwd(num_grids, denominator, seg, qslots, res, g):
    xr2d, gam2d, bet2d, w_sg, grid2d = res
    n, d_all = xr2d.shape
    groups = d_all // seg
    f = (num_grids + 1) * seg
    out = w_sg.shape[1]
    bn = min(_rbf_ln_sg_bn(seg, num_grids + 1, out, xr2d, w_sg, qslots,
                           True),
             _round_up(n, 8))
    np_ = _round_up(n, bn)
    xrp = jnp.pad(xr2d, ((0, np_ - n), (0, 0)))
    gp = jnp.pad(g, ((0, np_ - n), (0, 0)))
    aug2d = _rbf_aug(grid2d, denominator)
    dx, dw, dgam, dbet = pl.pallas_call(
        functools.partial(
            _rbf_ln_bwd_kernel_sg, ng=num_grids, denominator=denominator,
            seg=seg, qslots=qslots,
        ),
        grid=(groups // qslots, np_ // bn),
        in_specs=[
            pl.BlockSpec((bn, qslots * seg), lambda hp, i: (i, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qslots * f, out), lambda hp, i: (hp, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, qslots * out), lambda hp, i: (i, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qslots * seg), lambda hp, i: (0, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qslots * seg), lambda hp, i: (0, hp),
                         memory_space=pltpu.VMEM),
            _smem_spec(aug2d),
        ],
        out_specs=[
            pl.BlockSpec((bn, qslots * seg), lambda hp, i: (i, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qslots * f, out), lambda hp, i: (hp, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qslots * seg), lambda hp, i: (0, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qslots * seg), lambda hp, i: (0, hp),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, d_all), xr2d.dtype),
            jax.ShapeDtypeStruct((groups * f, out), w_sg.dtype),
            jax.ShapeDtypeStruct((1, d_all), gam2d.dtype),
            jax.ShapeDtypeStruct((1, d_all), bet2d.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, qslots * f), _dot_dtype(xr2d, w_sg)),
            pltpu.VMEM((bn, qslots * seg), jnp.float32),
            pltpu.VMEM((bn, qslots * seg), jnp.float32),
            pltpu.VMEM((qslots * f, out), jnp.float32),
            pltpu.VMEM((2, qslots * seg), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_RBF_SG_VMEM_LIMIT,
        ),
        interpret=dispatch.interpret_mode(),
    )(xrp, w_sg, gp, gam2d, bet2d, aug2d)
    return dx[:n], dgam, dbet, dw, jnp.zeros_like(grid2d)


_rbf_ln_sg_op.defvjp(_rbf_ln_sg_op_fwd, _rbf_ln_sg_op_bwd)


def fastkan_qkv_grouped(x2d, ln_gamma, ln_beta, rbf_grid, rbf_denominator,
                        spline_weight, base_weight, base_bias):
    """Grouped-head FastKAN projection (one of q/k/v).

    ``x2d (N, H*dh)`` head-sliced activation; per-head stacked params:
    ``ln_gamma/ln_beta (H, dh)``, ``spline_weight (H, out, dh*ng)``,
    ``base_weight (H, out, dh)``, ``base_bias (H, out)``. Returns
    ``y (N, H*out)`` (bias included), or None when the slot grouping or
    VMEM model says the shape cannot run here."""
    h, out, dh = base_weight.shape
    ng = rbf_grid.shape[-1]
    q = _sg_slots(h, dh)
    if q is None or not _should_fuse_sg(x2d.shape[0], h):
        return None
    w_probe = jnp.zeros((1, 1), spline_weight.dtype)
    if min(_rbf_ln_sg_bn(dh, ng + 1, out, x2d, w_probe, q, False),
           _rbf_ln_sg_bn(dh, ng + 1, out, x2d, w_probe, q, True)) < 32:
        return None
    # Per head: RBF slices then the silu base slice, flattened slot-major.
    w3d = spline_weight.reshape(h, out, dh, ng).transpose(0, 3, 2, 1)
    wb = base_weight.transpose(0, 2, 1)[:, None]  # (H, 1, dh, out)
    w_sg = jnp.concatenate([w3d, wb], axis=1).reshape(h * (ng + 1) * dh, out)
    gam2d = ln_gamma.reshape(1, h * dh)
    bet2d = ln_beta.reshape(1, h * dh)
    grid2d = rbf_grid.reshape(1, -1)
    y = _rbf_ln_sg_op(x2d, gam2d, bet2d, w_sg, grid2d, ng,
                      float(rbf_denominator), dh, q)
    return y + base_bias.reshape(1, h * out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _rbf_op(x2d, w3d, grid2d, num_grids, denominator):
    fam = rbf_family(num_grids, denominator)
    return _fused_fwd(x2d, w3d, (grid2d,), (_smem_spec(grid2d),), fam)


def _rbf_op_fwd(x2d, w3d, grid2d, num_grids, denominator):
    return _rbf_op(x2d, w3d, grid2d, num_grids, denominator), (x2d, w3d, grid2d)


def _rbf_op_bwd(num_grids, denominator, res, g):
    x2d, w3d, grid2d = res
    fam = rbf_family(num_grids, denominator)
    dx, dw = _fused_bwd(x2d, w3d, g, (grid2d,), (_smem_spec(grid2d),), fam)
    return dx, dw, jnp.zeros_like(grid2d)


_rbf_op.defvjp(_rbf_op_fwd, _rbf_op_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sine_op(x2d, w3d, freq2d, phase, grid_size):
    fam = sine_family(grid_size)
    kb = _kb_strategy(x2d, w3d, sine=True)
    if kb:
        # The kb kernels slice phase rows at a traced k*gb offset; Mosaic
        # only lowers that unaligned dynamic sublane load for f32 refs
        # ((8,128) tiling — bf16's packed (16,128) tiles reject it), so the
        # tiny (ng, in) phase rides f32 regardless of the policy dtype.
        phasef = phase.astype(jnp.float32)
        gb, bn_fwd = kb[0], kb[1]
        return _fused_fwd_kb(x2d, w3d, (freq2d, phasef),
                             (_smem_spec(freq2d), _full_vmem_spec(phasef)),
                             (1, 0), fam, gb, bn_fwd)
    return _fused_fwd(
        x2d, w3d, (freq2d, phase), (_smem_spec(freq2d), _full_vmem_spec(phase)), fam
    )


def _sine_split_ok(n, ng, nin, db):
    """Sine split-residual backward — MEASURED NEGATIVE at the ViT-S
    mapper, so OFF by default (``KANVIT_SINE_SPLIT=1`` re-enables): the
    2.06 GB bf16 residual's write+read (~5 ms) costs more than the sin
    recompute it saves (76.0 vs 73.7 ms fwd+params-bwd,
    tools/tpu_probe_sine_embed.py) — Mosaic's sin is cheap enough that
    recompute beats the HBM round trip."""
    import os

    if os.environ.get("KANVIT_SINE_SPLIT", "0") != "1":
        return False
    return n * ng * nin * db <= 3 * 1024 ** 3


def _sine_op_fwd(x2d, w3d, freq2d, phase, grid_size):
    kb = _kb_strategy(x2d, w3d, sine=True)
    if kb:
        ng, nin, out = w3d.shape
        db = jnp.dtype(_dot_dtype(x2d, w3d)).itemsize
        if _sine_split_ok(x2d.shape[0], ng, nin, db):
            fam = sine_family(grid_size)
            phasef = phase.astype(jnp.float32)  # see _sine_op
            gb, bn_fwd = kb[0], kb[1]
            y, basis = _fused_fwd_kb_basis(
                x2d, w3d, (freq2d, phasef),
                (_smem_spec(freq2d), _full_vmem_spec(phasef)), (1, 0),
                fam, gb, bn_fwd,
            )
            return y, (x2d, w3d, freq2d, phase, basis)
    return (_sine_op(x2d, w3d, freq2d, phase, grid_size),
            (x2d, w3d, freq2d, phase, None))


def _sine_op_bwd(grid_size, res, g):
    x2d, w3d, freq2d, phase, basis = res
    fam = sine_family(grid_size)
    kb = _kb_strategy(x2d, w3d, sine=True)
    if kb:
        phasef = phase.astype(jnp.float32)  # see _sine_op: Mosaic alignment
        gb, _, bn_dx, bn_dw, gb_dw = kb
        if basis is not None:
            dx, dw, dfreq = _fused_bwd_kb_sine_res(
                x2d, w3d, g, basis, freq2d, phasef, fam, gb, bn_dx, bn_dw,
            )
            return dx, dw, dfreq, jnp.zeros_like(phase)
        dx, dw, dfreq = _fused_bwd_kb(
            x2d, w3d, g, (freq2d, phasef),
            (_smem_spec(freq2d), _full_vmem_spec(phasef)), (1, 0),
            fam, gb, bn_dx, bn_dw, sine_freq_phase=(freq2d, phasef),
            gb_dw=gb_dw,
        )
        return dx, dw, dfreq, jnp.zeros_like(phase)
    joint = _fused_bwd_sine_plain(x2d, w3d, g, freq2d, phase)
    if joint is not None:
        dx, dw, dfreq = joint
        return dx, dw, dfreq, jnp.zeros_like(phase)
    dx, dw = _fused_bwd(
        x2d, w3d, g, (freq2d, phase), (_smem_spec(freq2d), _full_vmem_spec(phase)),
        fam,
    )
    # dfreq: small per-harmonic reduction, one fused XLA expression.
    # phase here is (ng, pack*in); sine_bases expects (in, ng) per slot —
    # with row packing the slot axis rides an extra einsum batch dim.
    n = x2d.shape[0]
    ng, nin, out = w3d.shape
    pack = x2d.shape[1] // nin
    _, _, dbf = K.sine_bases_and_grad(x2d, freq2d[0], phase.T)  # (N, p*in, ng)
    gw = jnp.einsum(
        "nro,gio->nrig",
        g.reshape(n, pack, out).astype(jnp.float32),
        w3d.astype(jnp.float32),
    ).reshape(n, pack * nin, ng)
    dfreq = jnp.sum(gw * dbf, axis=(0, 1))[None].astype(freq2d.dtype)
    return dx, dw, dfreq, jnp.zeros_like(phase)


_sine_op.defvjp(_sine_op_fwd, _sine_op_bwd)


def _fourier_hk(grid_size):
    """Harmonic multiplier per interleaved slice: [1, 1, 2, 2, ...]."""
    return jnp.repeat(
        jnp.arange(1, grid_size + 1, dtype=jnp.float32), 2
    ).reshape(1, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fourier_op(x2d, w3d, grid_size):
    kb = _kb_strategy(x2d, w3d, pair=True, recur=True)
    if kb:
        gb, bn_fwd = kb[0], kb[1]
        w3i = w3d[_fourier_interleave(grid_size)]
        hk = _fourier_hk(grid_size)
        return _fused_fwd_kb(x2d, w3i, (hk,), (_smem_spec(hk),), (1,),
                             fourier_family_kb(grid_size), gb, bn_fwd,
                             recur=True)
    return _fused_fwd(x2d, w3d, (), (), fourier_family(grid_size))


def _fourier_op_fwd(x2d, w3d, grid_size):
    return _fourier_op(x2d, w3d, grid_size), (x2d, w3d)


def _fourier_op_bwd(grid_size, res, g):
    x2d, w3d = res
    kb = _kb_strategy(x2d, w3d, pair=True, recur=True)
    if kb:
        gb, _, bn_dx, bn_dw, gb_dw = kb
        perm = _fourier_interleave(grid_size)
        hk = _fourier_hk(grid_size)
        dx, dwi = _fused_bwd_kb(x2d, w3d[perm], g, (hk,), (_smem_spec(hk),),
                                (1,), fourier_family_kb(grid_size), gb,
                                bn_dx, bn_dw, recur=True, gb_dw=gb_dw)
        return dx, dwi[jnp.argsort(perm)]
    dx, dw = _fused_bwd(x2d, w3d, g, (), (), fourier_family(grid_size))
    return dx, dw


_fourier_op.defvjp(_fourier_op_fwd, _fourier_op_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _cheby_op(x2d, w3d, degree):
    return _fused_fwd(x2d, w3d, (), (), cheby_family(degree))


def _cheby_op_fwd(x2d, w3d, degree):
    return _cheby_op(x2d, w3d, degree), (x2d, w3d)


def _cheby_op_bwd(degree, res, g):
    x2d, w3d = res
    dx, dw = _fused_bwd(x2d, w3d, g, (), (), cheby_family(degree))
    return dx, dw


_cheby_op.defvjp(_cheby_op_fwd, _cheby_op_bwd)


# ---------------------------------------------------------------------------
# Row packing for narrow inputs
# ---------------------------------------------------------------------------
#
# VPU registers are 128 lanes wide: every (bn, in) basis level at in=64 (the
# ViT d_head projections) wastes half its lanes, and the basis math
# dominates these kernels. Packing p = 128/in consecutive rows into one
# kernel row makes every tile full-lane and cuts grid steps p-fold. Exact
# because all basis families are elementwise per input feature.
#
# The contraction does NOT pay for the packing: the single-x template
# kernels lay the basis scratch out slot-major and run p slice dots against
# the ORIGINAL (F, out) weight (pack inferred from the x/w width ratio
# inside _fused_fwd/_fused_bwd; end-to-end A/B vs the earlier
# block-diagonal form in docs/PERFORMANCE.md). _pack_w3d's block-diagonal
# weight (packed row r's features feed only output columns
# [r*out, (r+1)*out), p x the dot flops on structural zeros) remains for
# the non-plain fallback tiers and the dual-input FastKAN template, where
# the transforms live OUTSIDE the custom-VJP ops and autodiff folds the
# packed dw back automatically.

def _row_pack_factor(nin: int) -> int:
    if os.environ.get("KANVIT_PACK", "1") == "0":  # benchmarking escape hatch
        return 1
    if nin < 128 and 128 % nin == 0:
        return 128 // nin
    return 1


def _pack_w3d(w3d, p):
    ng, nin, out = w3d.shape
    w2 = jnp.zeros((ng, p * nin, p * out), w3d.dtype)
    for r in range(p):
        w2 = w2.at[:, r * nin:(r + 1) * nin, r * out:(r + 1) * out].set(w3d)
    return w2


def _packed_rows(xf, p):
    n = xf.shape[0]
    np_ = _round_up(n, p)
    xp = jnp.pad(xf, ((0, np_ - n), (0, 0)))
    return xp.reshape(np_ // p, -1), np_


# ---------------------------------------------------------------------------
# Layer-facing entry points (same signatures as kanvit.ops.kan_bases)
# ---------------------------------------------------------------------------

def bspline_kan(x, grid, base_weight, spline_weight, spline_scaler, spline_order=3):
    lead = x.shape[:-1]
    nin = x.shape[-1]
    out = base_weight.shape[0]
    xf = x.reshape(-1, nin)
    ng = spline_weight.shape[-1]  # grid_size + spline_order
    if not _should_fuse(xf.shape[0], ng * nin, "bspline", nin):
        return K.bspline_kan_forward(
            x, grid, base_weight, spline_weight, spline_scaler, spline_order
        )
    scaled = (
        spline_weight * spline_scaler[..., None]
        if spline_scaler is not None
        else spline_weight
    )
    w3d = scaled.transpose(2, 1, 0)  # (ng, in, out)
    p = _row_pack_factor(nin)
    # The base branch (silu(x) @ base_weight.T) rides the kernel as one
    # extra basis slice with base_weight as the last w3d row — outside the
    # kernel it costs ~1.9 ms of the ViT-S qkv projection as a chain of
    # tiny HBM-bound XLA matmuls. Folding is skipped only when the extra
    # slice would push the backward into the out-blocked/XLA tiers (which
    # pay a basis recompute per out slab — measured ViT-S embedder bwd
    # 17.2 -> 21.6 ms when folded under "ob").
    db = jnp.dtype(_dot_dtype(xf, spline_weight)).itemsize
    fold = p > 1 or _bwd_strategy(
        xf.shape[0], nin, ng + 1, out,
        xf.dtype.itemsize, spline_weight.dtype.itemsize, db,
    ) in ("plain", "split")
    if fold:
        w3d = jnp.concatenate([w3d, base_weight.T[None]], axis=0)
    if p > 1:
        # Pack-aware: packed x, ORIGINAL weight (slice dots in-kernel);
        # the grid extra is tiled to the packed width for the basis math.
        xp, np_ = _packed_rows(xf, p)
        y = _bspline_op(xp, w3d, jnp.tile(grid.T, (1, p)),
                        ng - spline_order, spline_order, True)
        return y.reshape(np_, out)[: xf.shape[0]].reshape(*lead, out)
    y = _bspline_op(xf, w3d, grid.T, ng - spline_order, spline_order, fold)
    if not fold:
        y = y + jax.nn.silu(xf) @ base_weight.T
    return y.reshape(*lead, out)


def fastkan(x, ln_gamma, ln_beta, rbf_grid, rbf_denominator, spline_weight,
            base_weight, base_bias):
    lead = x.shape[:-1]
    nin = x.shape[-1]
    out = spline_weight.shape[0]
    ng = rbf_grid.shape[-1]
    xf = x.reshape(-1, nin)
    if not _should_fuse(xf.shape[0], spline_weight.shape[1], nin=nin):
        return K.fastkan_forward(
            x, ln_gamma, ln_beta, rbf_grid, rbf_denominator, spline_weight,
            base_weight, base_bias,
        )
    w3d = spline_weight.reshape(out, nin, ng).transpose(2, 1, 0)
    p = _row_pack_factor(nin)
    grid2d = rbf_grid.reshape(1, -1)
    if base_weight is not None and ln_gamma is not None:
        # Fold the LayerNorm AND the silu base branch into one kernel that
        # streams only raw x (segment-wise LN over packed lane groups, LN
        # VJP in-kernel). Outside the kernel the 18 per-block LN chains cost
        # ~0.7 ms at the ViT-S fast MSA and the dual-input op doubled the
        # streamed input traffic.
        w3b = jnp.concatenate([w3d, base_weight.T[None]], axis=0)
        if _rbf_ln_bn(0, p * nin, ng + 1, p * out, xf, w3b, True) >= 32:
            gam2d = jnp.tile(ln_gamma, p).reshape(1, -1)
            bet2d = jnp.tile(ln_beta, p).reshape(1, -1)
            if p > 1:
                xrp, np_ = _packed_rows(xf, p)
                y = _rbf_ln_base_op(xrp, gam2d, bet2d, _pack_w3d(w3b, p),
                                    grid2d, ng, float(rbf_denominator), nin)
                y = y.reshape(np_, out)[: xf.shape[0]]
            else:
                y = _rbf_ln_base_op(xf, gam2d, bet2d, w3b, grid2d, ng,
                                    float(rbf_denominator), nin)
            return (y + base_bias).reshape(*lead, out)
    # LayerNorm stays outside the custom VJP below this point: XLA fuses and
    # differentiates it.
    ln = xf if ln_gamma is None else K.layernorm(xf, ln_gamma, ln_beta)
    if base_weight is not None:
        # Fold the silu base branch into the kernel via the dual-input op
        # (it consumes RAW x while the RBF consumes LN(x)) whenever the
        # plain tier fits — the XLA-side base chains cost ~3.1 ms/block at
        # the ViT-S fast MSA.
        w3b = jnp.concatenate([w3d, base_weight.T[None]], axis=0)
        if _rbf_base_bn(0, p * nin, ng + 1, p * out, ln, w3b, True) >= 32:
            if p > 1:
                lnp, np_ = _packed_rows(ln, p)
                xrp, _ = _packed_rows(xf, p)
                y = _rbf_base_op(lnp, xrp, _pack_w3d(w3b, p), grid2d, ng,
                                 float(rbf_denominator))
                y = y.reshape(np_, out)[: xf.shape[0]]
            else:
                y = _rbf_base_op(ln, xf, w3b, grid2d, ng,
                                 float(rbf_denominator))
            return (y + base_bias).reshape(*lead, out)
    if p > 1:
        lnp, np_ = _packed_rows(ln, p)
        # The RBF grid is global (not per input feature): no tiling needed.
        y = _rbf_op(lnp, _pack_w3d(w3d, p), grid2d, ng,
                    float(rbf_denominator))
        y = y.reshape(np_, out)[: xf.shape[0]]
    else:
        y = _rbf_op(ln, w3d, grid2d, ng, float(rbf_denominator))
    if base_weight is not None:
        y = y + jax.nn.silu(xf) @ base_weight.T + base_bias
    return y.reshape(*lead, out)


def sinekan(x, freq, phase, amplitudes, bias):
    lead = x.shape[:-1]
    nin = x.shape[-1]
    out = amplitudes.shape[0]
    ng = freq.shape[-1]
    xf = x.reshape(-1, nin)
    kb_ok = _kb_eligible(nin, ng, out, x.dtype, amplitudes.dtype,
                          sine=True)
    if not _should_fuse(xf.shape[0], nin * ng, nin=nin, kb_ok=kb_ok):
        return K.sinekan_forward(x, freq, phase, amplitudes, bias)
    w3d = amplitudes.transpose(2, 1, 0)  # (ng, in, out)
    p = _row_pack_factor(nin)
    if p > 1:
        xp, np_ = _packed_rows(xf, p)
        y = _sine_op(xp, w3d, freq.reshape(1, -1),
                     jnp.tile(phase.T, (1, p)), ng)
        y = y.reshape(np_, out)[: xf.shape[0]]
    else:
        y = _sine_op(xf, w3d, freq.reshape(1, -1), phase.T, ng)
    if bias is not None:
        y = y + bias
    return y.reshape(*lead, out)


def sinekan_qkv(x, freqs, phase, amps, biases):
    """Fused q/k/v SineKAN projections over one shared input.

    The sine basis depends on per-projection trainable freq (so q/k/v
    cannot share ONE expansion the way B-spline/Chebyshev do in
    ``_shared_basis_qkv``), but the damped phase table is a deterministic
    function of (in, grid) (reference sinekan.py:59-75) and therefore
    identical across the three projections. Stacking them as one layer
    with 3*ng basis slices — freq vectors concatenated, phase tiled, and a
    block-diagonal (3ng, in, 3out) weight where slice group p feeds only
    output block p — computes all three in ONE kernel launch (one x
    stream, one joint backward, one dfreq accumulation) instead of three.
    Gradients to the structurally-zero weight blocks are discarded by the
    (differentiable) block construction. Measured at the ViT-S sine MSA:
    three separate launches cost ~22 ms/block; see
    benchmarks/vits_breakdown_sine.json.

    ``freqs``/``amps``/``biases``: 3-tuples of per-projection params
    ((ng,), (out, in, ng), (out,) or None). Returns (yq, yk, yv).
    """
    lead = x.shape[:-1]
    nin = x.shape[-1]
    out = amps[0].shape[0]
    ng = freqs[0].shape[-1]
    xf = x.reshape(-1, nin)
    # Gate on the per-projection width: the stack is 3 independent layers
    # sharing a launch, not one wide-grid layer (the f <= 8*nin rule in
    # _should_fuse targets single layers whose weight exceeds VMEM tiers).
    if not _should_fuse(xf.shape[0], nin * ng, nin=nin):
        return tuple(
            K.sinekan_forward(x, f, phase, a, b)
            for f, a, b in zip(freqs, amps, biases)
        )
    freq2d = jnp.concatenate([f.reshape(1, -1) for f in freqs], axis=1)
    phase3 = jnp.tile(phase.T, (3, 1))  # (3ng, nin)
    w = jnp.zeros((3 * ng, nin, 3 * out), amps[0].dtype)
    for pi, a in enumerate(amps):
        w = jax.lax.dynamic_update_slice(
            w, a.transpose(2, 1, 0), (pi * ng, 0, pi * out)
        )
    p = _row_pack_factor(nin)
    if p > 1:
        xp, np_ = _packed_rows(xf, p)
        y = _sine_op(xp, _pack_w3d(w, p), freq2d,
                     jnp.tile(phase3, (1, p)), 3 * ng)
        y = y.reshape(np_, 3 * out)[: xf.shape[0]]
    else:
        y = _sine_op(xf, w, freq2d, phase3, 3 * ng)
    ys = []
    for pi, b in enumerate(biases):
        yp = y[:, pi * out : (pi + 1) * out]
        if b is not None:
            yp = yp + b
        ys.append(yp.reshape(*lead, out))
    return tuple(ys)


def fourierkan(x, coeffs, bias):
    lead = x.shape[:-1]
    nin = x.shape[-1]
    _, out, _, grid_size = coeffs.shape
    xf = x.reshape(-1, nin)
    # The generic kb tier measured SLOWER than XLA here (184.3 vs 145.9 ms
    # op-level at the grid-28 mapper): with no trainable freq there was
    # nothing to pay for its 3x transcendental recompute. The harmonic
    # angle-addition recurrence kernels (cos/sin(kx) from one cos/sin(x)
    # pair — see _fwd_kernel_kbf) remove that bill and flip it decisively:
    # 65.8 vs 145.9 ms op-level (tools/tpu_probe_kb_mapper.py, round 3), so
    # kb is an enabler for fourier again.
    kb_ok = _kb_eligible(nin, 2 * grid_size, out, x.dtype, coeffs.dtype,
                         pair=True, recur=True)
    if not _should_fuse(xf.shape[0], nin * 2 * grid_size, nin=nin,
                        kb_ok=kb_ok):
        return K.fourierkan_forward(x, coeffs, bias)
    # (2, out, in, g) -> (2g, in, out): cos harmonics then sin harmonics.
    w3d = coeffs.transpose(0, 3, 2, 1).reshape(2 * grid_size, nin, out)
    p = _row_pack_factor(nin)
    if p > 1:
        xp, np_ = _packed_rows(xf, p)
        y = _fourier_op(xp, w3d, grid_size)
        y = y.reshape(np_, out)[: xf.shape[0]]
    else:
        y = _fourier_op(xf, w3d, grid_size)
    if bias is not None:
        y = y + bias
    return y.reshape(*lead, out)


def chebykan(x, coeffs):
    lead = x.shape[:-1]
    nin, out, deg1 = coeffs.shape
    xf = x.reshape(-1, nin)
    if not _should_fuse(xf.shape[0], nin * deg1, nin=nin):
        return K.chebykan_forward(x, coeffs)
    w3d = coeffs.transpose(2, 0, 1)  # (deg+1, in, out)
    p = _row_pack_factor(nin)
    if p > 1:
        xp, np_ = _packed_rows(xf, p)
        y = _cheby_op(xp, w3d, deg1 - 1)
        y = y.reshape(np_, out)[: xf.shape[0]]
    else:
        y = _cheby_op(xf, w3d, deg1 - 1)
    return y.reshape(*lead, out)
