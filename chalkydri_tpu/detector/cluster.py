"""Stage 3: gradient clustering — black/white boundary points grouped by
(black blob, white blob) pair.

Mirrors libapriltag's gradient_clusters() (consumed by the reference via
apriltag-sys, SURVEY.md section 2.3): every edge between a black pixel and a
white pixel contributes a boundary point at the doubled-coordinate edge
midpoint with a gradient direction; points are grouped by the *pair* of
component labels on either side, so each tag border yields one cluster.

TPU re-design (fixed shapes throughout, SURVEY.md section 7.3 'variable-size
intermediates'):

- candidate edges are enumerated densely (4 directions x H x W boolean
  masks),
- compacted into a fixed-capacity point buffer via cumsum + scatter,
- sorted by (black label, white label) with a single key sort,
- run-length segmented; the top-K segments by population become the cluster
  set, each padded/truncated to P points.

Capacities (MAX_CLUSTERS, MAX_CLUSTER_POINTS, MAX_EDGE_POINTS) are static;
overflow drops the smallest clusters first, matching the spirit of
MAX_DETECTIONS=16 (crates/apriltags/src/lib.rs:42).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

MAX_EDGE_POINTS = 1 << 16  # per frame, before clustering
MAX_CLUSTERS = 64  # candidate quads per frame
MAX_CLUSTER_POINTS = 512  # boundary points kept per cluster
MIN_CLUSTER_POINTS = 24  # smaller clusters can't be a tag border
MIN_BLOB_PIXELS = 25  # both blobs must be at least this big (libapriltag's
#                       gradient_clusters size gate; kills noise speckle)


class Clusters(NamedTuple):
    # Per cluster, per point: x, y in DOUBLED pixel coords; gx, gy gradient.
    points: jax.Array  # [K, P, 4] float32
    mask: jax.Array  # [K, P] bool
    count: jax.Array  # [K] int32 (true population, may exceed P)
    valid: jax.Array  # [K] bool (count >= MIN_CLUSTER_POINTS)


# Edge directions (dy, dx) — right, down, down-right, down-left; the four
# unique neighbor pairs libapriltag walks when emitting gradient points.
_DIRS = ((0, 1), (1, 0), (1, 1), (1, -1))


def _shift(x, dy, dx, fill):
    out = x
    if dy:
        out = jnp.roll(out, -dy, axis=0)
        out = out.at[-dy:, :].set(fill) if dy > 0 else out.at[:-dy, :].set(fill)
    if dx:
        out = jnp.roll(out, -dx, axis=1)
        out = out.at[:, -dx:].set(fill) if dx > 0 else out.at[:, :-dx].set(fill)
    return out


def extract_boundary_points(tern: jax.Array, labels: jax.Array):
    """Dense boundary-point enumeration for ONE frame.

    Args:
      tern: [H, W] uint8, labels: [H, W] int32.

    Returns:
      (black_lab, white_lab, x2, y2, gx, gy, mask) each [4*H*W] flattened —
      mask marks real boundary points.
    """
    h, w = tern.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    blacks, whites, x2s, y2s, gxs, gys, masks = [], [], [], [], [], [], []
    for dy, dx in _DIRS:
        nv = _shift(tern, dy, dx, jnp.uint8(127))
        nl = _shift(labels, dy, dx, jnp.int32(0))
        # one side black (0), other white (255)
        pair_sum = tern.astype(jnp.int32) + nv.astype(jnp.int32)
        is_edge = pair_sum == 255
        p_is_white = tern == 255
        black_lab = jnp.where(p_is_white, nl, labels)
        white_lab = jnp.where(p_is_white, labels, nl)
        # Doubled coords of the midpoint between p=(x,y) and q=(x+dx,y+dy).
        x2 = 2 * xs + dx
        y2 = 2 * ys + dy
        # Gradient points from black toward white.
        sign = jnp.where(p_is_white, -1, 1)  # q white -> +d, p white -> -d
        gx = sign * dx
        gy = sign * dy
        blacks.append(black_lab.reshape(-1))
        whites.append(white_lab.reshape(-1))
        x2s.append(x2.reshape(-1))
        y2s.append(y2.reshape(-1))
        gxs.append(gx.reshape(-1))
        gys.append(gy.reshape(-1))
        masks.append(is_edge.reshape(-1))
    cat = lambda xs: jnp.concatenate(xs)
    return (
        cat(blacks), cat(whites), cat(x2s), cat(y2s),
        cat(gxs), cat(gys), cat(masks),
    )


@partial(
    jax.jit,
    static_argnames=("max_points", "max_clusters", "cluster_points", "min_points"),
)
def gradient_clusters(
    tern: jax.Array,
    labels: jax.Array,
    max_points: int = MAX_EDGE_POINTS,
    max_clusters: int = MAX_CLUSTERS,
    cluster_points: int = MAX_CLUSTER_POINTS,
    min_points: int = MIN_CLUSTER_POINTS,
) -> Clusters:
    """Cluster boundary points for ONE frame ([H, W] inputs); vmap over batch."""
    h, w = tern.shape
    black, white, x2, y2, gx, gy, mask = extract_boundary_points(tern, labels)
    n_dense = black.shape[0]

    # Blob-size gate: both sides of the edge must belong to blobs of at least
    # MIN_BLOB_PIXELS pixels (libapriltag's gradient_clusters does the same
    # via unionfind set sizes) — this drops noise speckle before it can crowd
    # the fixed-capacity point buffer.
    lab_flat = labels.reshape(-1)
    lab_safe = jnp.where(lab_flat == jnp.iinfo(jnp.int32).max, h * w, lab_flat)
    blob_size = jnp.zeros((h * w + 1,), jnp.int32).at[lab_safe].add(1)
    big = lambda l: blob_size[jnp.clip(l, 0, h * w - 1)] >= MIN_BLOB_PIXELS
    mask = mask & big(black) & big(white)

    # --- compact to fixed capacity ----------------------------------------
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1  # position among real points
    slot = jnp.where(mask & (pos < max_points), pos, max_points)  # drop tail
    # +1 slack slot absorbs dropped entries.
    def compact(v, fill):
        buf = jnp.full((max_points + 1,), fill, v.dtype)
        return buf.at[slot].set(v, mode="drop")[:max_points]

    c_black = compact(black, jnp.int32(jnp.iinfo(jnp.int32).max))
    c_white = compact(white, jnp.int32(jnp.iinfo(jnp.int32).max))
    c_x2 = compact(x2, jnp.int32(0))
    c_y2 = compact(y2, jnp.int32(0))
    c_gx = compact(gx, jnp.int32(0))
    c_gy = compact(gy, jnp.int32(0))
    c_valid = compact(mask, False)

    # --- sort by (black, white) pair --------------------------------------
    # Single sort key: black * (H*W) + white fits in int64 only; instead use
    # float64-free two-level trick: sort by white first (stable), then by
    # black (stable) == lexsort. jnp.lexsort keys: last key is primary.
    order = jnp.lexsort((c_white, c_black))
    s_black = c_black[order]
    s_white = c_white[order]
    s_x2 = c_x2[order]
    s_y2 = c_y2[order]
    s_gx = c_gx[order]
    s_gy = c_gy[order]
    s_valid = c_valid[order]

    # --- segment runs ------------------------------------------------------
    prev_black = jnp.concatenate([jnp.array([-1], jnp.int32), s_black[:-1]])
    prev_white = jnp.concatenate([jnp.array([-1], jnp.int32), s_white[:-1]])
    new_seg = (s_black != prev_black) | (s_white != prev_white)
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # [N]
    seg_id = jnp.where(s_valid, seg_id, max_points)  # invalid -> overflow seg

    seg_count = jnp.zeros((max_points + 1,), jnp.int32).at[seg_id].add(1)
    # scatter-min needs a +inf-like init, else every start collapses to 0.
    seg_start = jnp.full((max_points + 1,), max_points, jnp.int32).at[seg_id].min(
        jnp.arange(max_points, dtype=jnp.int32), mode="drop"
    )

    # --- top-K segments by population --------------------------------------
    counts_real = seg_count[:max_points]
    top_count, top_seg = jax.lax.top_k(counts_real, max_clusters)
    top_start = seg_start[top_seg]

    # --- gather fixed-size point windows -----------------------------------
    offs = jnp.arange(cluster_points, dtype=jnp.int32)[None, :]  # [1, P]
    idx = top_start[:, None] + offs  # [K, P]
    idx_c = jnp.clip(idx, 0, max_points - 1)
    in_seg = (seg_id[idx_c] == top_seg[:, None]) & (idx < max_points)

    px = (s_x2[idx_c].astype(jnp.float32)) * jnp.float32(0.5)
    py = (s_y2[idx_c].astype(jnp.float32)) * jnp.float32(0.5)
    pgx = s_gx[idx_c].astype(jnp.float32)
    pgy = s_gy[idx_c].astype(jnp.float32)
    points = jnp.stack([px, py, pgx, pgy], axis=-1)
    points = jnp.where(in_seg[..., None], points, 0.0)

    valid = top_count >= min_points
    return Clusters(points=points, mask=in_seg, count=top_count, valid=valid)
