"""Attention math: vectorized multi-head attention + flash-attention reference.

The reference's ``MSA.forward`` is a per-sample, per-head Python double loop
over 2-D matmuls (reference ``attention.py:181-202``) — its single biggest
performance sin. Here the identical math is one batched einsum, so XLA maps
it onto the MXU in a single fused launch.

``flash_attention_reference`` is a pure-JAX (lax.scan) implementation of the
tiled online-softmax algorithm of reference ``utils.py:134-227`` ("Algorithm 1
in the v2 paper"), returning both the output and the logsumexp residual. It is
the executable spec for the Pallas kernel in
``kanvit.kernels.flash_attention`` and runs anywhere (CPU tests included).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def multi_head_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, causal: bool = False
) -> jnp.ndarray:
    """Plain softmax attention over pre-projected heads.

    ``q, k, v``: ``(..., T, d_head)`` (typically ``(B, H, T, d_head)``).
    Score scale is ``d_head ** -0.5`` (reference ``attention.py:199``).
    No output projection and no dropout — matching reference MSA semantics
    (SURVEY §2.9.4).
    """
    d_head = q.shape[-1]
    scores = jnp.einsum("...id,...jd->...ij", q, k) * (d_head**-0.5)
    if causal:
        tq, tk = scores.shape[-2], scores.shape[-1]
        mask = jnp.tril(jnp.ones((tq, tk), dtype=bool), k=tk - tq)
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("...ij,...jd->...id", weights, v)


@functools.partial(jax.jit, static_argnames=("causal", "q_block", "k_block"))
def flash_attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    q_block: int = 512,
    k_block: int = 1024,
    mask: jnp.ndarray | None = None,
):
    """Blocked online-softmax attention; returns ``(o, lse)``.

    Pure-JAX replication of reference ``utils.py:135-227``: for each q tile,
    stream k/v tiles, keep running row max ``m`` and row sum ``l``, rescale
    the accumulator by ``exp(m_old - m_new)``, and finish with ``o / l`` and
    ``lse = log(l) + m``. Row sums are clamped at ``EPSILON = 1e-10``
    (reference ``utils.py:10,206``). ``q_block``/``k_block`` play the role of
    the reference's ``q_bucket_size``/``k_bucket_size``.

    Shapes: ``q`` ``(B, H, Tq, D)``; ``k, v`` ``(B, H, Tk, D)``;
    optional key mask ``(B, Tk)`` bool (True = attend), the reference's
    ``b n -> b 1 1 n`` semantics (``utils.py:154-164``).
    """
    orig_dtype = q.dtype
    q, k, v = (t.astype(jnp.float32) for t in (q, k, v))
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = d**-0.5
    eps = 1e-10
    neg = jnp.finfo(jnp.float32).min
    qk_len_diff = max(tk - tq, 0)

    # Never tile wider than the (8-aligned) sequence itself — the online
    # softmax is block-size invariant, and padding 17-token sequences to a
    # 512 bucket would be pure waste.
    q_block = min(q_block, -(-tq // 8) * 8)
    k_block = min(k_block, -(-tk // 8) * 8)

    # Pad sequence dims to block multiples; padded keys are masked out.
    pq = (-tq) % q_block
    pk = (-tk) % k_block
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
    if mask is not None:
        maskp = jnp.pad(mask.astype(bool), ((0, 0), (0, pk)))
    nq, nk = qp.shape[2] // q_block, kp.shape[2] // k_block

    k_tiles = kp.reshape(b, h, nk, k_block, d)
    v_tiles = vp.reshape(b, h, nk, k_block, d)
    q_tiles = qp.reshape(b, h, nq, q_block, d).transpose(2, 0, 1, 3, 4)

    def per_q_tile(qi, qc):
        q_start = qi * q_block - qk_len_diff

        def per_k_tile(carry, inputs):
            o, m, l = carry
            ki, kc, vc = inputs
            s = jnp.einsum("bhid,bhjd->bhij", qc, kc) * scale
            kpos = ki * k_block + jnp.arange(k_block)
            key_valid = (kpos < tk)[None, None, None, :]
            if mask is not None:
                mc = jax.lax.dynamic_slice_in_dim(maskp, ki * k_block, k_block, 1)
                key_valid = key_valid & mc[:, None, None, :]
            s = jnp.where(key_valid, s, neg)
            if causal:
                qpos = q_start + jnp.arange(q_block)
                cmask = qpos[:, None] >= kpos[None, :]
                s = jnp.where(cmask[None, None], s, neg)
            block_max = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(block_max, m)
            p = jnp.exp(s - m_new)
            p = jnp.where(key_valid, p, 0.0)
            block_sum = jnp.clip(jnp.sum(p, axis=-1, keepdims=True), min=eps)
            correction = jnp.exp(m - m_new)
            l_new = correction * l + block_sum
            o_new = o * correction + jnp.einsum("bhij,bhjd->bhid", p, vc)
            return (o_new, m_new, l_new), None

        o0 = jnp.zeros((b, h, q_block, d), jnp.float32)
        m0 = jnp.full((b, h, q_block, 1), neg, jnp.float32)
        l0 = jnp.zeros((b, h, q_block, 1), jnp.float32)
        (o, m, l), _ = jax.lax.scan(
            per_k_tile,
            (o0, m0, l0),
            (jnp.arange(nk), k_tiles.transpose(2, 0, 1, 3, 4), v_tiles.transpose(2, 0, 1, 3, 4)),
        )
        l = jnp.clip(l, min=eps)
        return o / l, jnp.log(l) + m

    o, lse = jax.lax.map(
        lambda args: per_q_tile(*args), (jnp.arange(nq), q_tiles)
    )
    o = o.transpose(1, 2, 0, 3, 4).reshape(b, h, nq * q_block, d)[:, :, :tq]
    lse = lse.transpose(1, 2, 0, 3, 4).reshape(b, h, nq * q_block, 1)[:, :, :tq]
    return o.astype(orig_dtype), lse[..., 0]
