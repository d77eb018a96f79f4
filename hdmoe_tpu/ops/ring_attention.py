"""Ring attention: context/sequence-parallel attention over a mesh axis.

For the 256x256+ latent stretch configs the fused attention's O(L^2) score
tile streaming (ops/pallas/flash_attention.py) still binds a single chip's
HBM/FLOPs; this module shards the SEQUENCE over a mesh axis and rotates K/V
shards around the ring with ``lax.ppermute`` (ICI neighbor exchange), merging
per-shard partial attention with the online-softmax recurrence — each device
only ever holds O(L/n) keys. The reference has no analog (SURVEY.md §5
"long-context/sequence parallelism: ABSENT").

``ring_attention_local`` is the per-device body (use under ``shard_map``);
``sequence_parallel_attention`` wraps a full array + mesh into the sharded
call. Communication is neighbor-only ppermute — XLA lowers it onto the ICI
ring; compute of the current block overlaps the next shard's transfer.
"""

from __future__ import annotations

import math
from functools import partial
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def ring_attention_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    axis_size: int,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-device ring attention body (call inside shard_map).

    q: (B, H, Lq_local, D); k/v: (B, H, Lk_local, D) — the local sequence
    shards. Returns the exact global-attention output for the local queries.

    ``bias`` is the rel-pos bias with LOCAL query rows and GLOBAL key
    columns, (H, Lq_local, Lk_global): each ring step slices the column
    block belonging to the kv shard currently held (after ``step`` hops the
    shard that originated on device ``i - step`` is resident), so the TMSA
    blocks' learnable bias works unchanged under sequence parallelism.
    """
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    b, h, lq, _ = q.shape
    lk = k.shape[2]

    m = jnp.full((b, h, lq, 1), -1e30, dtype=jnp.float32)
    l = jnp.zeros((b, h, lq, 1), dtype=jnp.float32)
    acc = jnp.zeros((b, h, lq, d), dtype=jnp.float32)

    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    my_idx = lax.axis_index(axis_name)

    k_cur, v_cur = k, v
    for step in range(axis_size):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cur, preferred_element_type=jnp.float32) * scale
        if bias is not None:
            src = (my_idx - step) % axis_size  # origin device of the resident shard
            b_blk = lax.dynamic_slice_in_dim(bias.astype(jnp.float32), src * lk, lk, axis=2)
            s = s + b_blk[None]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32), preferred_element_type=jnp.float32
        )
        m = m_new
        if step < axis_size - 1:
            # rotate kv shards one hop around the ring; overlaps with the next
            # block's compute under XLA's async collective scheduling
            k_cur = lax.ppermute(k_cur, axis_name, perm)
            v_cur = lax.ppermute(v_cur, axis_name, perm)

    return (acc / l).astype(q.dtype)


def sequence_parallel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """softmax(QK^T/sqrt(d) + bias) V with the sequence dim sharded over ``axis``.

    q/k/v: (B, H, L, D) global arrays; L must divide by the axis size.
    ``bias`` (H, Lq, Lk) shards by query rows; key columns stay global and
    are sliced per ring step.
    """
    n = mesh.shape[axis]
    assert q.shape[2] % n == 0 and k.shape[2] % n == 0, "seq must divide the mesh axis"
    spec = P(None, None, axis, None)
    if bias is None:
        fn = shard_map(
            partial(ring_attention_local, axis_name=axis, axis_size=n),
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
        )
        return fn(q, k, v)
    fn = shard_map(
        lambda q_, k_, v_, b_: ring_attention_local(q_, k_, v_, axis_name=axis, axis_size=n, bias=b_),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None, axis, None)),
        out_specs=spec,
    )
    return fn(q, k, v, bias)
