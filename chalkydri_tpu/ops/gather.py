"""Fast flat gathers for TPU: row-gather + in-row lane select.

XLA lowers an arbitrary flat 1D gather ``table[idx]`` on TPU to a slow
per-element path (~60 ns/element on v5e — it dominates the detector's
post-CCL stages), while a gather of contiguous 128-lane ROWS from a
``[n/128, 128]`` view is near memory speed (the same observation drove
the block compaction in detector/cluster.py). ``rowsel_gather`` rewrites
any flat gather as: gather the 128-wide row holding each element, then
select the element with a broadcast-compare + masked sum (one VPU reduce,
no second gather).

Measured on v5e (tools/perfprobe.py harness, int32):
- 65k-element table, 4x8192 indices under vmap: 0.40 ms flat -> 0.15 ms
- 1M-element table, 9216 indices: 0.106 ms flat -> 0.006 ms
- batch folded into the row dimension (``rowsel_gather_batched``):
  4x8192 from 4x65k in 0.058 ms — 7x over the vmapped flat gather.

Semantics: exact ``table[idx]`` for in-range indices (callers clip, as
jnp's default gather clamp would); requires ``table.size % 128 == 0``
(every hot table in the detector is lane-aligned by construction).

On CPU/GPU the 128x widened compare+reduce is a pessimization, so
``rowsel_gather`` falls back to the plain flat gather there — results are
bit-identical either way (both are exact gathers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LANES = 128


def _use_rowsel() -> bool:
    return jax.devices()[0].platform not in ("cpu", "gpu")


def rowsel_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` for a flat 1D table; fast path on TPU.

    table: [N] with N % 128 == 0; idx: any shape, int32, values in [0, N).
    """
    if table.ndim != 1:
        raise ValueError("rowsel_gather table must be 1D")
    if not _use_rowsel():
        return table[idx]
    n = table.shape[0]
    if n % _LANES:  # unaligned tables take the plain path (none are hot)
        return table[idx]
    rows = table.reshape(-1, _LANES)
    flat = idx.reshape(-1)
    r = rows[flat >> 7]  # [M, 128] contiguous-row gather (fast on TPU)
    lane = (flat & (_LANES - 1))[:, None]
    iota = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
    zero = jnp.zeros((), r.dtype)
    return jnp.where(iota == lane, r, zero).sum(axis=1).reshape(idx.shape)


def rowsel_gather_batched(tables: jax.Array, idx: jax.Array) -> jax.Array:
    """Per-batch ``tables[b][idx[b]]`` with the batch FOLDED into the row
    dimension — one unbatched row gather instead of a batched one (XLA's
    batched row gather is ~2.5x slower; see module docstring).

    tables: [B, N] with N % 128 == 0; idx: [B, ...] int32 in [0, N).
    """
    if tables.ndim != 2:
        raise ValueError("rowsel_gather_batched tables must be [B, N]")
    b, n = tables.shape
    if not _use_rowsel() or n % _LANES:
        return jax.vmap(lambda t, i: t[i])(tables, idx)
    offs = (jnp.arange(b, dtype=jnp.int32) * n).reshape(
        (b,) + (1,) * (idx.ndim - 1)
    )
    return rowsel_gather(tables.reshape(-1), idx + offs)
