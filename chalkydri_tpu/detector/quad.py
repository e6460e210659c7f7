"""Stage 4: quad fitting — turn each boundary cluster into a candidate quad.

libapriltag's fit_quads (via apriltag-sys in the reference, SURVEY.md
section 2.3) sorts boundary points by angle, finds 4 corner indices by line-fit
error peaks, then refits lines per edge and intersects them. The custom
detector sketches the same geometry via gift-wrapping
(``/root/reference/crates/chalkydri-apriltags/src/utils.rs:27-153``).

TPU re-design: a fixed-iteration expectation-maximization style fit, identical
work for every cluster (vmap over [K] clusters x [B] frames):

1. init corners at the extreme points along the 4 diagonal directions
   (+x+y, +x-y, -x-y, -x+y) — robust for convex quads,
2. repeat N times (static):
   a. assign each boundary point to the nearest of the 4 current edges,
   b. weighted least-squares line fit (PCA of the point scatter) per edge,
   c. new corners = intersections of adjacent lines,
3. quad filters: every edge supported by >= MIN_EDGE_POINTS points, min edge
   length, convexity, bounded residual.

Corners come out ordered counter-clockwise in image coords (y down) starting
from the corner that, for an upright tag, is bottom-left — matching
libapriltag's detection corner convention, which in turn matches the solver's
tag-frame corner order (``crates/chalkydri_sqpnp/src/lib.rs:379-394``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

FIT_ITERS = 4  # refine_quads recovers sub-pixel accuracy afterwards
MIN_EDGE_POINTS = 5
MIN_EDGE_LEN = 6.0  # pixels
MAX_LINE_RMS = 1.2  # pixels, residual gate


class Quads(NamedTuple):
    corners: jax.Array  # [K, 4, 2] float32, CCW (image coords, y down)
    valid: jax.Array  # [K] bool


def _line_fit(px, py, w):
    """Weighted PCA line fit. Returns (cx, cy, nx, ny, rms): point-normal form
    n . (p - c) = 0 with |n| = 1; rms is the normal-residual RMS."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    cx = jnp.sum(px * w) / wsum
    cy = jnp.sum(py * w) / wsum
    dx = px - cx
    dy = py - cy
    sxx = jnp.sum(w * dx * dx) / wsum
    syy = jnp.sum(w * dy * dy) / wsum
    sxy = jnp.sum(w * dx * dy) / wsum
    # Normal = eigenvector of the smaller eigenvalue of [[sxx,sxy],[sxy,syy]].
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    lam_small = tr / 2.0 - disc
    # (A - lam I) n = 0  ->  n ∝ (sxy, lam - sxx) or (lam - syy, sxy)
    n1 = jnp.stack([sxy, lam_small - sxx])
    n2 = jnp.stack([lam_small - syy, sxy])
    use1 = jnp.sum(n1 * n1) > jnp.sum(n2 * n2)
    n = jnp.where(use1, n1, n2)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(n * n), 1e-12))
    n = n / norm
    rms = jnp.sqrt(jnp.maximum(lam_small, 0.0))
    return cx, cy, n[0], n[1], rms


def _intersect(c1x, c1y, n1x, n1y, c2x, c2y, n2x, n2y):
    """Intersection of two point-normal lines (solve 2x2)."""
    det = n1x * n2y - n1y * n2x
    safe = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    b1 = n1x * c1x + n1y * c1y
    b2 = n2x * c2x + n2y * c2y
    x = (b1 * n2y - b2 * n1y) / safe
    y = (n1x * b2 - n2x * b1) / safe
    degenerate = jnp.abs(det) < 1e-9
    return x, y, degenerate


def fit_quad(points: jax.Array, mask: jax.Array,
             fit_iters: int = FIT_ITERS) -> tuple[jax.Array, jax.Array]:
    """Fit one quad to one cluster. points [P, 4] (x, y, gx, gy), mask [P].

    Returns (corners [4, 2], valid scalar bool).
    """
    px = points[:, 0]
    py = points[:, 1]
    w = mask.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    cx = jnp.sum(px * w) / wsum
    cy = jnp.sum(py * w) / wsum

    # --- init: extremes along 4 diagonals ---------------------------------
    neg = jnp.float32(-1e9)
    s1 = jnp.where(mask, (px - cx) + (py - cy), neg)
    s2 = jnp.where(mask, (px - cx) - (py - cy), neg)
    s3 = jnp.where(mask, -(px - cx) - (py - cy), neg)
    s4 = jnp.where(mask, -(px - cx) + (py - cy), neg)
    corners0 = jnp.stack(
        [
            jnp.stack([px[jnp.argmax(s)], py[jnp.argmax(s)]])
            for s in (s1, s2, s3, s4)
        ]
    )  # [4, 2], in rough angular order around the centroid

    def iteration(corners, _):
        # Edge i runs corner i -> corner (i+1)%4.
        c_next = jnp.roll(corners, -1, axis=0)
        ex = c_next[:, 0] - corners[:, 0]  # [4]
        ey = c_next[:, 1] - corners[:, 1]
        elen = jnp.sqrt(jnp.maximum(ex * ex + ey * ey, 1e-12))
        # Distance from each point to each edge segment (use line distance
        # clamped to the segment's along-range).
        rx = px[None, :] - corners[:, 0:1]  # [4, P]
        ry = py[None, :] - corners[:, 1:2]
        t = (rx * ex[:, None] + ry * ey[:, None]) / (elen * elen)[:, None]
        t = jnp.clip(t, 0.0, 1.0)
        qx = corners[:, 0:1] + t * ex[:, None]
        qy = corners[:, 1:2] + t * ey[:, None]
        d2 = (px[None, :] - qx) ** 2 + (py[None, :] - qy) ** 2  # [4, P]
        assign = jnp.argmin(d2, axis=0)  # [P]

        new_corners = []
        rmss = []
        counts = []
        fits = []
        for e in range(4):
            we = w * (assign == e)
            counts.append(jnp.sum(we))
            fits.append(_line_fit(px, py, we))
        for e in range(4):
            # corner e = intersection of edge (e-1) and edge e ... corners[e]
            # is the START of edge e and END of edge e-1.
            pcx, pcy, pnx, pny, prms = fits[(e - 1) % 4]
            ccx, ccy, cnx, cny, crms = fits[e]
            x, y, deg = _intersect(pcx, pcy, pnx, pny, ccx, ccy, cnx, cny)
            new_corners.append(jnp.stack([x, y]))
            rmss.append(crms)
        corners = jnp.stack(new_corners)
        aux = (jnp.stack(counts), jnp.stack(rmss))
        return corners, aux

    # Unrolled fixed iterations (a lax.scan here lowers to dynamic-slice
    # bookkeeping that dominates this tiny per-cluster workload).
    corners = corners0
    aux = None
    for _ in range(fit_iters):
        corners, aux = iteration(corners, None)
    counts, rmss = aux

    # --- orientation: make CCW in image coords (y down) -------------------
    # Signed area (shoelace); for y-down pixel coords, a tag's boundary
    # traversed bottom-left -> bottom-right -> top-right -> top-left has
    # negative shoelace area.
    c_next = jnp.roll(corners, -1, axis=0)
    area2 = jnp.sum(
        corners[:, 0] * c_next[:, 1] - c_next[:, 0] * corners[:, 1]
    )
    flip = area2 > 0
    corners = jnp.where(flip, corners[::-1], corners)

    # --- validity gates -----------------------------------------------------
    c_next = jnp.roll(corners, -1, axis=0)
    elen = jnp.linalg.norm(c_next - corners, axis=1)
    cross = (
        (c_next[:, 0] - corners[:, 0]) * (jnp.roll(c_next, -1, axis=0)[:, 1] - c_next[:, 1])
        - (c_next[:, 1] - corners[:, 1]) * (jnp.roll(c_next, -1, axis=0)[:, 0] - c_next[:, 0])
    )
    convex = jnp.all(cross < 0) | jnp.all(cross > 0)
    finite = jnp.all(jnp.isfinite(corners))
    valid = (
        finite
        & convex
        & jnp.all(counts >= MIN_EDGE_POINTS)
        & jnp.all(elen >= MIN_EDGE_LEN)
        & jnp.all(rmss <= MAX_LINE_RMS)
    )
    return corners, valid


@partial(jax.jit, static_argnames=("fit_iters",))
def fit_quads(points: jax.Array, mask: jax.Array, cluster_valid: jax.Array,
              fit_iters: int = FIT_ITERS) -> Quads:
    """Fit all clusters of one frame: points [K, P, 4], mask [K, P]."""
    corners, valid = jax.vmap(lambda p, m: fit_quad(p, m, fit_iters))(
        points, mask
    )
    return Quads(corners=corners, valid=valid & cluster_valid)
