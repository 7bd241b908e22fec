"""Sequence-parallel ring attention over a mesh axis.

Scales attention to sequences that exceed one chip's HBM: the sequence
axis is sharded across devices, each device holds its q/k/v chunk, and
the k/v chunks rotate around the ring via ``lax.ppermute`` (one ICI hop
per step) while every device folds each arriving chunk into its local
online-softmax accumulators — the same running (m, l, o) recurrence the
flash kernel uses in VMEM (``kanvit/kernels/flash_attention.py``), lifted
one level up the memory hierarchy (chips over ICI instead of tiles over
VMEM). Compute and communication overlap naturally: chunk i+1 is in
flight while chunk i is being contracted.

This is the SP extension seam docs/COMPONENTS.md names: the reference has
no sequence parallelism at all (its longest sequence is 197 tokens; its
only parallelism is the broken DataParallel vestige, reference
``attention.py:56-57,91-97``). Ring attention is the standard TPU recipe
for the long-context regime the causal-decoder benchmark targets
(``benchmarks/causal_decoder.py``, seq 2k-8k single-chip today).

Numerics match ``flash_attention`` exactly (same online-softmax algebra,
same EPSILON=1e-10 clamp on the softmax denominator); the backward is
JAX autodiff through the scan+ppermute ring with per-chunk
rematerialization (``jax.checkpoint`` on the chunk fold — residuals per
device stay O(local chunk), not O(sequence)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

EPSILON = 1e-10  # softmax-denominator clamp (flash_attention parity)


def _fold_chunk(q, k_c, v_c, o, m, l, q_off, k_off, scale, causal):
    """Fold one arriving k/v chunk into the online-softmax accumulators.

    q (B, H, Tq, d); k_c/v_c (B, H, Tc, d); o (B, H, Tq, d) f32;
    m/l (B, H, Tq) f32 running max / denominator. q_off/k_off are the
    GLOBAL sequence offsets of the local q rows and this chunk's k rows
    (the chunk index rides the ring, so k_off is a traced scalar).
    """
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k_c, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        q_pos = q_off + lax.iota(jnp.int32, q.shape[2])[:, None]
        k_pos = k_off + lax.iota(jnp.int32, k_c.shape[2])[None, :]
        s = jnp.where(q_pos >= k_pos, s, -1e30)
    m_new = jnp.maximum(m, s.max(axis=-1))
    p = jnp.exp(s - m_new[..., None])
    alpha = jnp.exp(m - m_new)
    l_new = l * alpha + p.sum(axis=-1)
    o_new = o * alpha[..., None] + jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v_c.dtype), v_c,
        preferred_element_type=jnp.float32,
    )
    return o_new, m_new, l_new


def _ring_local(q, k, v, *, axis_name, n_shards, causal, scale):
    """The per-device body: local q stays put, k/v chunks ride the ring."""
    idx = lax.axis_index(axis_name)
    tl = q.shape[2]
    q_off = idx * tl
    o = jnp.zeros(q.shape, jnp.float32)
    m = jnp.full(q.shape[:3], -1e30, jnp.float32)
    l = jnp.zeros(q.shape[:3], jnp.float32)
    perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]
    fold = jax.checkpoint(
        functools.partial(_fold_chunk, scale=scale, causal=causal)
    )

    def step(carry, i):
        o, m, l, k_c, v_c = carry
        src = (idx - i) % n_shards  # which global chunk k_c/v_c hold now
        o, m, l = fold(q, k_c, v_c, o, m, l, q_off, src * tl)
        if n_shards > 1:
            k_c = lax.ppermute(k_c, axis_name, perm)
            v_c = lax.ppermute(v_c, axis_name, perm)
        return (o, m, l, k_c, v_c), None

    (o, m, l, _, _), _ = lax.scan(
        step, (o, m, l, k, v), jnp.arange(n_shards)
    )
    return (o / jnp.maximum(l, EPSILON)[..., None]).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh | None = None,
    axis_name: str = "data",
    causal: bool = False,
) -> jnp.ndarray:
    """Attention over ``(B, H, T, d)`` with ``T`` sharded on ``axis_name``.

    With no mesh (or a 1-device axis) this is exactly ``flash_attention``;
    with a mesh, the inputs are (re)sharded ``P(None, None, axis_name,
    None)`` and each device computes its sequence chunk's output while k/v
    rotate around the ring — peak per-device memory is O(T/n) activations
    plus one in-flight chunk, so the reachable sequence length scales
    linearly with the ring size. ``T`` must divide the axis.
    """
    if mesh is not None:
        n = mesh.shape.get(axis_name, 1)
    else:
        n = 1
    if n <= 1:
        from kanvit.kernels.flash_attention import flash_attention

        return flash_attention(q, k, v, causal=causal)
    t = q.shape[2]
    if t % n or k.shape[2] != t:
        raise ValueError(
            f"ring_attention: seq {t} (k {k.shape[2]}) must divide the "
            f"{n}-way '{axis_name}' axis and match"
        )
    scale = q.shape[3] ** -0.5
    spec = P(None, None, axis_name, None)
    body = functools.partial(
        _ring_local, axis_name=axis_name, n_shards=n, causal=causal,
        scale=scale,
    )
    from kanvit.parallel import runtime

    def wrapped(ql, kl, vl):
        with runtime.local_region():
            return body(ql, kl, vl)

    return shard_map(
        wrapped, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
