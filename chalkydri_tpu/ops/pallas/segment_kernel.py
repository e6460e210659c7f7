"""Pallas TPU kernel: run-length segment statistics over sorted keys.

After the cluster stage's grouping sort (detector/cluster.py
``cluster_candidates``), the run-length segmentation needs three full-length
scans over the sorted array — forward cummax (run start positions), reverse
cummin (next run start), and a cumsum (direction-0 population for the
diversity ranking) — plus a handful of elementwise ops. As separate XLA ops
each scan round-trips HBM; at 64k rows x batch 4 they are a measurable slice
of the detect step. This kernel loads (key, payload) into VMEM once and
produces both downstream arrays in a single pass:

- ``t[i]``: inclusive count of direction-0 candidates in [0, i] — gathered
  at the chunk winners for the direction-diversity rank;
- ``cand_len``/``cand_pos``: the per-128-chunk top-2 pre-selection of runs
  by length (run starts scored with their run length, 2 winners per
  lane-row), computed in-kernel from the scanned arrays so no full-length
  operand ever leaves VMEM.

1D scans over the [rows, 128] VMEM layout run in two phases (in-row lane
scan by Hillis-Steele doubling, then a row-aggregate scan down the sublane
axis), exactly the recipe of the CCL kernel's segmented scans
(ops/pallas/ccl_kernel.py).

Semantics are asserted bit-identical to the jnp path in
tests/test_detector.py (the jnp path remains the non-TPU fallback).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT_MAX = jnp.iinfo(jnp.int32).max


def _roll(x, shift, axis, size):
    return pltpu.roll(x, shift % size, axis=axis)


def _scan_1d(v, combine, ident, rows, row_idx, col_idx, reverse=False):
    """Inclusive scan of a row-major-flattened [rows, 128] block.

    combine: associative (jnp.maximum / jnp.minimum / add); ident: its
    identity. reverse=True scans from the flat END toward the start.
    """
    def masked(vv, shifted, oob):
        return combine(vv, jnp.where(oob, ident, shifted))

    direction = -1 if reverse else 1
    # Phase A: in-row scan along lanes.
    for k in range(7):  # log2(128)
        s = (1 << k) * direction
        sh = _roll(v, s, 1, 128)
        if direction > 0:
            oob = col_idx < (1 << k)
        else:
            oob = col_idx >= 128 - (1 << k)
        v = masked(v, sh, oob)
    import math

    # Phase B: exclusive prefix of ROW TOTALS down (up if reverse) rows.
    # The row total is the in-row scan's value at its final lane (lane 127
    # forward, lane 0 reverse) — NOT a reduction over the scanned row,
    # which double-counts for sum. Broadcast it across the row by rolling
    # the final lane to every lane position and selecting.
    end_lane = 127 if direction > 0 else 0
    totals = jnp.where(col_idx == end_lane, v, ident)
    red = jnp.max if combine is jnp.maximum else (
        jnp.min if combine is jnp.minimum else jnp.sum)
    # .astype: under jax_enable_x64 (the test env) integer reductions
    # promote to int64, which Mosaic doesn't vectorize.
    totals = jnp.broadcast_to(
        red(totals, axis=1, keepdims=True).astype(v.dtype), v.shape)
    steps = max(1, math.ceil(math.log2(rows)))
    p = totals
    for k in range(steps):
        s = (1 << k) * direction
        sh = _roll(p, s, 0, rows)
        if direction > 0:
            oob = row_idx < (1 << k)
        else:
            oob = row_idx >= rows - (1 << k)
        p = masked(p, sh, oob)
    # p is the INCLUSIVE row-total prefix; make it exclusive by shifting
    # one row (in scan direction) and filling the boundary row with ident.
    p_ex = _roll(p, direction, 0, rows)
    if direction > 0:
        p_ex = jnp.where(row_idx == 0, ident, p_ex)
    else:
        p_ex = jnp.where(row_idx == rows - 1, ident, p_ex)
    return combine(p_ex, v)


def _shift_flat(x, rows, row_idx, col_idx, direction, fill):
    """Shift a row-major-flattened [rows, 128] block by one element.

    direction +1: out[i] = x[i-1] (out[0] = fill);
    direction -1: out[i] = x[i+1] (out[last] = fill).
    """
    lane = _roll(x, direction, 1, 128)
    # The lane roll wraps within each row; the wrapped lane must come from
    # the neighboring ROW instead.
    fix = _roll(lane, direction, 0, rows)
    if direction > 0:
        out = jnp.where(col_idx == 0, fix, lane)
        out = jnp.where((row_idx == 0) & (col_idx == 0), fill, out)
    else:
        out = jnp.where(col_idx == 127, fix, lane)
        out = jnp.where((row_idx == rows - 1) & (col_idx == 127), fill, out)
    return out


def _make_kernel(rows):
    n = rows * 128

    def kernel(key_ref, payload_ref, t_ref, stats_ref):
        key = key_ref[:]
        payload = payload_ref[:]
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        idx = row_idx * 128 + col_idx

        prev = _shift_flat(key, rows, row_idx, col_idx, +1, jnp.int32(-1))
        new_seg = key != prev
        valid = key != _INT_MAX

        start_pos = _scan_1d(
            jnp.where(new_seg, idx, -1), jnp.maximum, jnp.int32(-1),
            rows, row_idx, col_idx)
        nxt = jnp.where(new_seg, idx, _INT_MAX)
        next_start = _scan_1d(
            nxt, jnp.minimum, _INT_MAX, rows, row_idx, col_idx, reverse=True)
        # next run start AFTER i: shift left one element, fill n at the end.
        next_after = _shift_flat(
            next_start, rows, row_idx, col_idx, -1, jnp.int32(n))
        next_after = jnp.minimum(next_after, n)
        run_len = next_after - start_pos

        d0 = ((((payload >> 26) & 0x3) == 0) & valid).astype(jnp.int32)
        t_ref[:] = _scan_1d(d0, jax.lax.add, jnp.int32(0),
                            rows, row_idx, col_idx)
        score = jnp.where(new_seg & valid, run_len, 0)

        # Per-ROW top-2 of score (the chunked pre-selection, chunk = 128):
        # lane 0..3 of stats hold (m1, a1, m2, a2); a1/a2 are LANE indices
        # (the caller adds row*128 for global positions).
        m1 = jnp.max(score, axis=1, keepdims=True)
        is_m1 = score == m1
        a1 = jnp.min(jnp.where(is_m1, col_idx, 128), axis=1, keepdims=True)
        score2 = jnp.where(col_idx == a1, 0, score)
        m2 = jnp.max(score2, axis=1, keepdims=True)
        a2 = jnp.min(jnp.where(score2 == m2, col_idx, 128), axis=1,
                     keepdims=True)
        stats = jnp.where(col_idx == 0, m1, 0)
        stats = jnp.where(col_idx == 1, a1, stats)
        stats = jnp.where(col_idx == 2, m2, stats)
        stats = jnp.where(col_idx == 3, a2, stats)
        stats_ref[:] = stats

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def segment_stats_pallas(s_key: jax.Array, s_payload: jax.Array,
                         interpret: bool = False):
    """(t, cand_len, cand_pos) for cluster_candidates.

    s_key/s_payload: [n] int32 sorted by key, n a multiple of 128 (the
    caller's compaction guarantees it). cand_len/cand_pos are the
    per-128-chunk top-2 pre-selection winners (2 * n/128 entries), run
    lengths and global start positions.
    """
    n = s_key.shape[0]
    assert n % 128 == 0, "segment_stats_pallas needs n % 128 == 0"
    rows = n // 128
    kernel = _make_kernel(rows)
    spec = pl.BlockSpec((rows, 128), lambda: (0, 0), memory_space=pltpu.VMEM)
    t, stats = pl.pallas_call(
        kernel,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        ),
        interpret=interpret,
    )(s_key.reshape(rows, 128), s_payload.reshape(rows, 128))
    # stats lanes 0..3: per-row (m1, a1, m2, a2); a* are lane indices.
    base = jnp.arange(rows, dtype=jnp.int32) * 128
    cand_len = jnp.concatenate([stats[:, 0], stats[:, 2]])
    cand_pos = jnp.concatenate(
        [base + jnp.minimum(stats[:, 1], 127),
         base + jnp.minimum(stats[:, 3], 127)])
    return t.reshape(n), cand_len, cand_pos
