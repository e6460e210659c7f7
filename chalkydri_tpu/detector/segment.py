"""Stage 2: connected-component labeling (CCL) by parallel label propagation.

The reference's detectors both use pointer-chasing union-find for
segmentation: libapriltag's unionfind (via apriltag-sys) and the custom
detector's raw-pointer ``UnionFind``
(``/root/reference/crates/chalkydri-apriltags/src/lib.rs:42-113,501-549``).
Pointer-chasing is hostile to SIMD/TPU; the standard data-parallel replacement
(SURVEY.md sections 2.3, 7.3) is iterative label propagation with pointer
jumping:

- every non-'skip' pixel starts with its own flat index as label,
- each round: (a) min label over connected neighbors (same binary value;
  8-connectivity for white pixels, 4-connectivity for black, mirroring
  libapriltag's merge rule), (b) segmented min-SCANS along rows and columns
  (an associative scan that resets at run boundaries — this moves labels
  across an entire run in one pass, so wide background regions converge in a
  few rounds instead of O(width)), (c) 'pointer jumping'
  (label <- label[label], twice) for cross-run shortcuts.

Everything is fixed-shape; the number of rounds is a static parameter chosen
so realistic scenes converge (validated in tests/test_detector.py, including a
convergence-check helper).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Label value for 'skip' (127) pixels: larger than any flat index.
INVALID = jnp.iinfo(jnp.int32).max

DEFAULT_ITERS = 8
JUMPS_PER_ITER = 2


def _segmented_min_scan(labels: jax.Array, val: jax.Array, axis: int) -> jax.Array:
    """Min-scan labels along ``axis``, resetting where the binary value
    changes (runs of equal value share their minimum). Bidirectional."""

    def combine(a, b):
        av, ab = a
        bv, bb = b
        v = jnp.where(bb, bv, jnp.minimum(av, bv))
        return v, ab | bb

    def scan_dir(lab, v):
        boundary = jnp.ones_like(v, dtype=bool)
        same = v == jnp.roll(v, 1, axis=axis)
        idx = [slice(None)] * v.ndim
        idx[axis] = slice(1, None)
        boundary = boundary.at[tuple(idx)].set(~same[tuple(idx)])
        out, _ = jax.lax.associative_scan(combine, (lab, boundary), axis=axis)
        return out

    def flip(x):
        return jnp.flip(x, axis=axis)

    fwd = scan_dir(labels, val)
    bwd = flip(scan_dir(flip(labels), flip(val)))
    return jnp.minimum(fwd, bwd)


def _shift2d(x: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    """Shift a [B, H, W] array by (dy, dx), filling vacated cells."""
    out = x
    if dy:
        out = jnp.roll(out, dy, axis=1)
        if dy > 0:
            out = out.at[:, :dy, :].set(fill)
        else:
            out = out.at[:, dy:, :].set(fill)
    if dx:
        out = jnp.roll(out, dx, axis=2)
        if dx > 0:
            out = out.at[:, :, :dx].set(fill)
        else:
            out = out.at[:, :, dx:].set(fill)
    return out


# Neighbor offsets: 4-connectivity for all pixels; diagonals only merge white
# pixels (mirrors libapriltag's do_unionfind_line2: v==255 also connects
# up-left / up-right).
_OFFSETS_ALL = ((0, 1), (0, -1), (1, 0), (-1, 0))
_OFFSETS_WHITE = ((1, 1), (1, -1), (-1, 1), (-1, -1))


@partial(jax.jit, static_argnames=("iters",))
def label_components(tern: jax.Array, iters: int = DEFAULT_ITERS) -> jax.Array:
    """Label connected components of the ternary image.

    Args:
      tern: [B, H, W] uint8 in {0, 127, 255} from ``adaptive_threshold``.
      iters: propagation rounds (each with min-neighbor + 2 pointer jumps).

    Returns:
      labels: [B, H, W] int32 — flat-index labels, INVALID on skip pixels.
      Two pixels share a label iff they're in the same blob (once converged).
    """
    b, h, w = tern.shape
    flat_idx = jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w)
    valid = tern != 127
    labels = jnp.where(valid, flat_idx, INVALID)

    val = tern

    def neighbor_min(lab):
        m = lab
        for dy, dx in _OFFSETS_ALL:
            nl = _shift2d(lab, dy, dx, INVALID)
            nv = _shift2d(val, dy, dx, jnp.uint8(127))
            same = (nv == val) & valid
            m = jnp.minimum(m, jnp.where(same, nl, INVALID))
        is_white = val == 255
        for dy, dx in _OFFSETS_WHITE:
            nl = _shift2d(lab, dy, dx, INVALID)
            nv = _shift2d(val, dy, dx, jnp.uint8(127))
            same = (nv == val) & valid & is_white
            m = jnp.minimum(m, jnp.where(same, nl, INVALID))
        return m

    def jump(lab):
        # label <- label[label] (path compression); INVALID passes through.
        flat = lab.reshape(b, h * w)
        safe = jnp.minimum(flat, h * w - 1)
        hopped = jnp.take_along_axis(flat, safe, axis=1)
        flat = jnp.where(flat == INVALID, INVALID, hopped)
        return flat.reshape(b, h, w)

    def body(_, lab):
        lab = neighbor_min(lab)
        # Long-range propagation along runs; skip pixels stay INVALID because
        # a 127-valued pixel forms its own run (val differs from neighbors)
        # and its label is INVALID on both scan sides.
        lab = _segmented_min_scan(lab, val, axis=2)
        lab = _segmented_min_scan(lab, val, axis=1)
        lab = jnp.where(valid, lab, INVALID)
        for _ in range(JUMPS_PER_ITER):
            lab = jump(lab)
        return lab

    labels = jax.lax.fori_loop(0, iters, body, labels)
    return labels


def labels_converged(tern, labels) -> bool:
    """Test helper: true if one more round would not change any label."""
    after = label_components_step(tern, labels)
    return bool(jnp.all(after == labels))


def label_components_step(tern: jax.Array, labels: jax.Array) -> jax.Array:
    """One propagation round (for convergence checking in tests)."""
    b, h, w = tern.shape
    valid = tern != 127
    val = tern
    m = labels
    for dy, dx in _OFFSETS_ALL:
        nl = _shift2d(labels, dy, dx, INVALID)
        nv = _shift2d(val, dy, dx, jnp.uint8(127))
        same = (nv == val) & valid
        m = jnp.minimum(m, jnp.where(same, nl, INVALID))
    is_white = val == 255
    for dy, dx in _OFFSETS_WHITE:
        nl = _shift2d(labels, dy, dx, INVALID)
        nv = _shift2d(val, dy, dx, jnp.uint8(127))
        same = (nv == val) & valid & is_white
        m = jnp.minimum(m, jnp.where(same, nl, INVALID))
    flat = m.reshape(b, h * w)
    safe = jnp.minimum(flat, h * w - 1)
    hopped = jnp.take_along_axis(flat, safe, axis=1)
    flat = jnp.where(flat == INVALID, INVALID, hopped)
    return flat.reshape(b, h, w)
