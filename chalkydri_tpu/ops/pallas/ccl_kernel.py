"""Pallas TPU kernel: connected-component labeling, fully in VMEM.

The jnp CCL (detector/segment.py) streams the whole label image through HBM
~50 times per frame (12 rounds x shifts/scans). At quad-search resolution a
full frame's labels fit in VMEM (e.g. 400 x 640 int32 = 1 MB), so this kernel
loads the ternary image once, runs ALL propagation rounds on-chip (VPU rolls
+ segmented doubling scans), and writes the converged labels once — HBM
traffic drops from ~50 passes to 2.

Same algorithm and result as the jnp path (tests assert equality):
- neighbor-min over the libapriltag connectivity (4-conn all, 8-conn white),
- bidirectional segmented min-scans along rows and columns, implemented as
  Hillis-Steele doubling with ``pltpu.roll`` and edge masking,
- per-round re-masking of 'skip' pixels.

Grid: one program per frame (TPU grid steps run sequentially per core; each
loads its own frame).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVALID = jnp.iinfo(jnp.int32).max

_OFFSETS_ALL = ((0, 1), (0, -1), (1, 0), (-1, 0))
_OFFSETS_WHITE = ((1, 1), (1, -1), (-1, 1), (-1, -1))


def _roll(x, shift, axis, size):
    """pltpu.roll with support for negative shifts (wraps both ways)."""
    return pltpu.roll(x, shift % size, axis=axis)


def _shift_no_wrap(x, dy, dx, fill, row_idx, col_idx, h, w):
    """Shift with edge fill (pltpu.roll wraps; mask the wrapped lanes)."""
    out = x
    if dy:
        out = _roll(out, dy, 0, h)
        edge = row_idx < dy if dy > 0 else row_idx >= h + dy
        out = jnp.where(edge, fill, out)
    if dx:
        out = _roll(out, dx, 1, w)
        edge = col_idx < dx if dx > 0 else col_idx >= w + dx
        out = jnp.where(edge, fill, out)
    return out


def _segmented_scan_axis(labels, boundary_fwd, boundary_bwd, axis, size,
                         pos_idx):
    """Bidirectional segmented min-scan via Hillis-Steele doubling.

    boundary_fwd[i] is True where a run starts scanning forward;
    boundary_bwd[i] where one starts scanning backward. pos_idx is the
    coordinate along ``axis`` (2D iota).
    """
    import math

    steps = max(1, math.ceil(math.log2(size)))

    def one_direction(v, b, direction):
        # direction +1: combine with element at i - s (forward scan).
        # b is int32 {0, 1}: Mosaic only rotates 32-bit vectors.
        for k in range(steps):
            s = 1 << k
            sh = s * direction
            v_sh = _roll(v, sh, axis, size)
            b_sh = _roll(b, sh, axis, size)
            if direction > 0:
                oob = pos_idx < s
            else:
                oob = pos_idx >= size - s
            v_sh = jnp.where(oob, INVALID, v_sh)
            b_sh = jnp.where(oob, 1, b_sh)
            v = jnp.where(b == 1, v, jnp.minimum(v, v_sh))
            b = b | b_sh
        return v

    fwd = one_direction(labels, boundary_fwd, +1)
    bwd = one_direction(labels, boundary_bwd, -1)
    return jnp.minimum(fwd, bwd)


def _tile_stat(x, op, row_idx, col_idx, h, w):
    """Exact 4x4-tile min/max broadcast back to pixel resolution, rolls only
    (replicates detector/threshold.py's tile semantics in-kernel).

    1. sliding 4-window reduce along each axis anchored at the window top/left,
    2. select the tile-anchor rows/cols (r%4==0) and replicate their value
       across the tile with masked shifts.
    """
    fill = jnp.int32(255) if op == "min" else jnp.int32(0)
    fn = jnp.minimum if op == "min" else jnp.maximum

    def slide4(v, axis, size, pos):
        out = v
        for s in (1, 2, 3):
            sh = _roll(v, -s, axis, size)
            sh = jnp.where(pos >= size - s, fill, sh)
            out = fn(out, sh)
        return out

    def broadcast_anchor(v, axis, size, pos):
        # keep anchor positions, then push each anchor value down 1..3 slots
        anchored = jnp.where(pos % 4 == 0, v, fill)
        out = anchored
        for s in (1, 2, 3):
            sh = _roll(anchored, s, axis, size)
            out = jnp.where(pos % 4 == s, sh, out)
        return out

    v = slide4(x, 0, h, row_idx)
    v = slide4(v, 1, w, col_idx)
    v = broadcast_anchor(v, 0, h, row_idx)
    v = broadcast_anchor(v, 1, w, col_idx)
    return v


def _neighborhood3_tiles(v, op, row_idx, col_idx, h, w):
    """3x3 TILE neighborhood over tile-broadcast values: +-4 pixel shifts
    (edge tiles contribute nothing, matching reduce_window's init padding)."""
    fill = jnp.int32(255) if op == "min" else jnp.int32(0)
    fn = jnp.minimum if op == "min" else jnp.maximum
    out = v
    for d in (-4, 4):
        sh = _roll(v, d, 0, h)
        edge = row_idx < d if d > 0 else row_idx >= h + d
        out = fn(out, jnp.where(edge, fill, sh))
    v2 = out
    for d in (-4, 4):
        sh = _roll(v2, d, 1, w)
        edge = col_idx < d if d > 0 else col_idx >= w + d
        out = fn(out, jnp.where(edge, fill, sh))
    return out


def _prefix_count(flags, direction, axis, size, pos_idx):
    """Directional inclusive prefix count of {0,1} flags along an axis
    (Hillis-Steele doubling). direction +1 counts from the start of the
    axis; -1 from the end."""
    import math

    steps = max(1, math.ceil(math.log2(size)))
    c = flags
    for k in range(steps):
        s = 1 << k
        sh = s * direction
        c_sh = _roll(c, sh, axis, size)
        if direction > 0:
            oob = pos_idx < s
        else:
            oob = pos_idx >= size - s
        c = c + jnp.where(oob, 0, c_sh)
    return c


def _segmented_scan_axis_packed(labels, seg_fwd, seg_bwd, axis, size,
                                pos_idx, label_bits):
    """Bidirectional segmented min-scan with (segment, payload) packed into
    ONE int32: a plain directional max-scan then respects segment
    boundaries for free (a later segment's higher seg bits dominate), so
    each doubling step is roll + mask + max — ~2x fewer VPU ops than
    carrying a separate boundary operand. Requires labels < 2^label_bits
    and segment indices < 2^(31 - label_bits). INVALID labels clip to the
    max payload -> packed 0, losing to any real label; all-invalid runs
    decode to a junk label that round_fn's validity mask overwrites.
    """
    import math

    steps = max(1, math.ceil(math.log2(size)))
    maxl = (1 << label_bits) - 1
    payload = maxl - jnp.minimum(labels, maxl)

    def one_direction(seg, direction):
        v = (seg << label_bits) | payload
        for k in range(steps):
            s = 1 << k
            sh = s * direction
            v_sh = _roll(v, sh, axis, size)
            if direction > 0:
                oob = pos_idx < s
            else:
                oob = pos_idx >= size - s
            v = jnp.maximum(v, jnp.where(oob, 0, v_sh))
        return maxl - (v & maxl)

    fwd = one_direction(seg_fwd, +1)
    bwd = one_direction(seg_bwd, -1)
    return jnp.minimum(fwd, bwd)


def _ccl_from_val(val, h, w, iters, offsets, labels0=None,
                  want_converged=False, final_cond=False,
                  label_bound=None):
    """Shared CCL body: ternary val [h, w] int32 -> labels int32.

    ``labels0``: optional initial labeling (min-propagation converges from
    any labeling; the blocked path threads globally-offset labels through
    repeated invocations). Default: the pixel's own flat index.

    When labels are the default flat indices (bounded by h*w) and the
    packing budget fits int32, the per-round segmented scans run PACKED
    (see _segmented_scan_axis_packed); with caller-provided labels
    (unbounded values) the tuple-scan path is used.

    ``want_converged``: also return an int32 flag — 1 iff the propagation
    reached its true fixed point (the loop exited on the convergence test,
    not the ``iters`` latency cap). The two-phase blocked merge uses this
    as its exactness certificate (see _seam_solve_relabel).

    ``label_bound``: for caller-provided ``labels0``, an exclusive upper
    bound on every non-INVALID label value. Knowing the bound lets each
    axis's segmented scan use the PACKED implementation when
    label_bits + that axis's segment bits fit the 31-bit budget — the
    packing decision is PER AXIS, so e.g. the blocked merge props
    (22-bit global labels on 264x1600 blocks) pack the column scan
    (22 + 9 bits) while the row scan (22 + 11) takes the tuple path.
    Without a bound, caller-provided labels use the tuple path on both
    axes.

    ``final_cond``: choose the loop bracketing. False (default) is the
    plain convergence-gated loop: every round pays neighbor-min + scans,
    including the confirming round. True re-brackets so the fixed-point
    test runs on the neighbor-min output BEFORE the scans are paid, with
    a closing lax.cond that pays the final scan set only on a cap exit —
    a convergence exit skips one whole scan set. Both produce bitwise
    identical labels (see the bracket comment below for the proof sketch).
    The trade-off is VMEM: Mosaic stacks the closing cond's scan
    temporaries NEXT TO the while body's, growing the kernel's live set
    from ~96 to ~128 B/padded-pixel (compile-probed on v5e). The blocked
    path's kernels use True — their blocks are <= 512k px (worst-case
    ~64 MiB at 128 B/px) and their post-merge re-propagations converge in
    1-3 rounds, where skipping the confirming scans is a large fraction —
    while the whole-frame kernels keep False: 800x1280 (the
    SINGLE_BLOCK_MAX_PIXELS ceiling) already fills 125 of 128 MiB VMEM at
    the old bracket, and the bench geometry measured no win from the
    re-bracketing (threshold_ccl 0.470 vs 0.46 ms).
    """
    import math

    valid = val != 127
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    flat_labels = labels0 is None
    if flat_labels:
        flat_idx = row_idx * w + col_idx
        labels0 = jnp.where(valid, flat_idx, INVALID)
    else:
        labels0 = jnp.where(valid, labels0, INVALID)

    if flat_labels and label_bound is None:
        label_bound = h * w
    label_bits = (
        max(1, math.ceil(math.log2(label_bound + 1)))
        if label_bound is not None else None
    )
    seg_row_bits = max(1, math.ceil(math.log2(w + 1)))
    seg_col_bits = max(1, math.ceil(math.log2(h + 1)))
    packed_row = label_bits is not None and label_bits + seg_row_bits <= 31
    packed_col = label_bits is not None and label_bits + seg_col_bits <= 31

    is_white = val == 255
    # NOTE (round-4 revert): the neighbor-min keeps ALL 8 offsets. A
    # round-3 attempt to drop the 4-conn offsets (claiming the segmented
    # scans subsume them) regressed real scenes — scans reset at value-run
    # boundaries, so axis-adjacent propagation across jogs is not covered
    # within the iteration budget (aruco corpus 84 -> 72 matches).
    bits = jnp.zeros((h, w), jnp.int32)
    # bits 0..7: connectivity per offset (4-conn all, diagonals white-only)
    for i, (dy, dx) in enumerate(offsets):
        nv = _shift_no_wrap(val, dy, dx, jnp.int32(127), row_idx, col_idx, h, w)
        same = (nv == val) & valid
        if i >= 4:
            same = same & is_white
        bits = bits | (same.astype(jnp.int32) << i)

    # bits 8..11: scan run boundaries (row fwd/bwd, col fwd/bwd)
    def boundaries(axis, direction):
        d = (0, direction) if axis == 1 else (direction, 0)
        nv = _shift_no_wrap(val, d[0], d[1], jnp.int32(127), row_idx, col_idx, h, w)
        pos = col_idx if axis == 1 else row_idx
        at_edge = pos == 0 if direction > 0 else pos == (w if axis == 1 else h) - 1
        return ((nv != val) | at_edge).astype(jnp.int32)

    bits = bits | (boundaries(1, +1) << 8)
    bits = bits | (boundaries(1, -1) << 9)
    bits = bits | (boundaries(0, +1) << 10)
    bits = bits | (boundaries(0, -1) << 11)
    bits = bits | (valid.astype(jnp.int32) << 12)

    # Segment indices are round-invariant: count run starts once.
    if packed_row:
        seg_row_f = _prefix_count((bits >> 8) & 1, +1, 1, w, col_idx)
        seg_row_b = _prefix_count((bits >> 9) & 1, -1, 1, w, col_idx)
    if packed_col:
        seg_col_f = _prefix_count((bits >> 10) & 1, +1, 0, h, row_idx)
        seg_col_b = _prefix_count((bits >> 11) & 1, -1, 0, h, row_idx)

    def neighbor_min(labels):
        m = labels
        for i, (dy, dx) in enumerate(offsets):
            nl = _shift_no_wrap(labels, dy, dx, INVALID, row_idx, col_idx, h, w)
            same = (bits >> i) & 1
            m = jnp.minimum(m, jnp.where(same == 1, nl, INVALID))
        return m

    def scans_remask(m):
        if packed_row:
            m = _segmented_scan_axis_packed(
                m, seg_row_f, seg_row_b, 1, w, col_idx, label_bits
            )
        else:
            m = _segmented_scan_axis(
                m, (bits >> 8) & 1, (bits >> 9) & 1, 1, w, col_idx
            )
        if packed_col:
            m = _segmented_scan_axis_packed(
                m, seg_col_f, seg_col_b, 0, h, row_idx, label_bits
            )
        else:
            m = _segmented_scan_axis(
                m, (bits >> 10) & 1, (bits >> 11) & 1, 0, h, row_idx
            )
        return jnp.where((bits >> 12) & 1 == 1, m, INVALID)

    if iters <= 0:
        if want_converged:
            return labels0, jnp.int32(0)
        return labels0

    if final_cond:
        # Re-bracketed loop: the fixed-point test runs on the NEIGHBOR-MIN
        # output before the scans are paid for — nm(L) == L already
        # certifies the global fixed point (labels then agree across every
        # connected edge, so they are constant on components and the scans
        # are no-ops too; scans(nm(L)) <= nm(L) <= L pointwise makes the
        # two exit tests coincide on reachable states). The carry holds
        # ONLY the neighbor-min image (a second label page in the carry
        # blew the whole-frame kernels' VMEM budget: 67 MB vs the 48 MB
        # live set at 652x800), exploiting that at a convergence exit the
        # carried nm output IS the converged labels. Per round the work
        # stays one nm + one scan set, but a convergence exit skips the
        # scans the plain loop's confirming round paid. The label SEQUENCE
        # is unchanged: the loop runs at most ``iters - 1`` scan rounds
        # and the closing lax.cond pays the final scan set only on a cap
        # exit, so the result is scans(nm(L_{iters-1})) = L_iters there —
        # bitwise identical to the plain loop at the cap as well as at
        # convergence (unique fixed point). ``iters`` stays the hard
        # latency bound.
        m0 = neighbor_min(labels0)

        def cond(carry):
            i, _, changed = carry
            return (i < iters - 1) & changed

        def body(carry):
            i, m, _ = carry
            new = scans_remask(m)
            m2 = neighbor_min(new)
            return i + 1, m2, jnp.any(m2 != new)

        _, m_out, changed = jax.lax.while_loop(
            cond, body, (jnp.int32(0), m0, jnp.any(m0 != labels0))
        )
        labels_out = jax.lax.cond(changed, scans_remask, lambda m: m, m_out)
    else:
        # Plain convergence-gated loop: typical scenes settle in fewer
        # rounds than the worst-case budget; a fixed-point check per round
        # exits early (``iters`` stays the hard latency bound).
        def cond(carry):
            i, _, changed = carry
            return (i < iters) & changed

        def body(carry):
            i, labels, _ = carry
            new = scans_remask(neighbor_min(labels))
            return i + 1, new, jnp.any(new != labels)

        _, labels_out, changed = jax.lax.while_loop(
            cond, body, (jnp.int32(0), labels0, jnp.bool_(True))
        )
    if want_converged:
        # The loop exits with changed=False only at a true fixed point;
        # exiting on the iters cap (changed still True) is uncertified.
        return labels_out, jnp.where(changed, jnp.int32(0), jnp.int32(1))
    return labels_out


def _make_kernel(h, w, iters):
    offsets = list(_OFFSETS_ALL) + list(_OFFSETS_WHITE)

    def kernel(tern_ref, out_ref):
        # Work in int32 throughout: Mosaic's vector rotate (pltpu.roll) only
        # supports 32-bit lanes.
        val = tern_ref[:].astype(jnp.int32)
        out_ref[:] = _ccl_from_val(val, h, w, iters, offsets)

    return kernel


def _make_fused_kernel(h, w, iters, min_diff):
    """Threshold + CCL in one kernel: gray u8 in, (labels, tern) out. The
    adaptive tile threshold (detector/threshold.py semantics, exactly) runs
    on the VMEM-resident frame so the ternary image never round-trips HBM
    before labeling."""
    offsets = list(_OFFSETS_ALL) + list(_OFFSETS_WHITE)

    def kernel(gray_ref, labels_ref, tern_ref):
        g = gray_ref[:].astype(jnp.int32)
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        tmin = _tile_stat(g, "min", row_idx, col_idx, h, w)
        tmax = _tile_stat(g, "max", row_idx, col_idx, h, w)
        tmin = _neighborhood3_tiles(tmin, "min", row_idx, col_idx, h, w)
        tmax = _neighborhood3_tiles(tmax, "max", row_idx, col_idx, h, w)
        contrast = tmax - tmin
        thresh = tmin + contrast // 2
        val = jnp.where(g > thresh, jnp.int32(255), jnp.int32(0))
        val = jnp.where(contrast < min_diff, jnp.int32(127), val)
        tern_ref[:] = val.astype(jnp.uint8)
        labels_ref[:] = _ccl_from_val(val, h, w, iters, offsets)

    return kernel


def _extract_candidates(val, labels, h, w, row_idx, col_idx, dirs, min_same,
                        core_top=0, core_bottom=0, y_offset=0):
    """In-kernel boundary-candidate extraction over the VMEM-resident
    ternary image + converged labels: bit-identical to
    ``cluster.extract_boundary_points``, whose dense stencils otherwise
    re-run over HBM after the kernel wrote tern/labels back. Returns
    per-direction (black, white, payload) lists; flattened dir-major
    [2, h, w] this is exactly the jnp enumeration order, so the
    downstream block compaction consumes it unchanged.

    ``core_top``/``core_bottom``/``y_offset``: the halo semantics of
    ``extract_boundary_points`` — rows outside
    [core_top, h - core_bottom) are neighbor context only (the blocked
    extract kernel feeds each row block with 1 halo row above and 2
    below), and packed y coordinates are globalized with ``y_offset``
    (the block's core row origin) so the emitted candidates are
    bit-identical to a whole-frame run.

    Sign convention: ``_shift_no_wrap(x, dy, dx)`` yields the neighbor at
    offset (-dy, -dx) — the CCL never notices (its offset set is
    symmetric) but extraction does, so fetch (dy, dx) neighbors by
    negating."""

    def nbr(x, dy, dx, fill):
        return _shift_no_wrap(x, -dy, -dx, fill, row_idx, col_idx, h, w)

    solid_cnt = jnp.zeros((h, w), jnp.int32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nv = nbr(val, dy, dx, jnp.int32(127))
            solid_cnt = solid_cnt + (nv == val).astype(jnp.int32)
    solid = solid_cnt >= min_same

    core = True
    if core_top or core_bottom:
        core = (row_idx >= core_top) & (row_idx < h - core_bottom)

    blacks, whites, payloads = [], [], []
    for di, (dy, dx) in enumerate(dirs):
        nv = nbr(val, dy, dx, jnp.int32(127))
        nl = nbr(labels, dy, dx, jnp.int32(0))
        # fill 0 < min_same, matching the jnp path's shifted-False fill
        ns = nbr(solid_cnt, dy, dx, jnp.int32(0)) >= min_same
        pair_sum = val + nv
        is_edge = (pair_sum == 255) & solid & ns & core
        p_is_white = val == 255
        black = jnp.where(p_is_white, nl, labels)
        white = jnp.where(p_is_white, labels, nl)
        blacks.append(jnp.where(is_edge, black, INVALID))
        whites.append(jnp.where(is_edge, white, INVALID))
        x2 = 2 * col_idx + dx
        y2 = 2 * (row_idx - core_top + y_offset) + dy
        payloads.append(
            (x2 & 0x1FFF)
            | ((y2 & 0x1FFF) << 13)
            | ((di & 0x3) << 26)
            | (jnp.where(p_is_white, 1, 0) << 28)
        )
    return blacks, whites, payloads


def _make_fused_extract_kernel(h, w, iters, min_diff):
    """Threshold + CCL + boundary-candidate extraction in ONE kernel: gray
    u8 in, dense (black, white, payload) candidate pages out. tern and
    labels never leave VMEM — the detector's single-device hot path needs
    only the candidates (cluster.py consumes them; nothing downstream reads
    the label image)."""
    from chalkydri_tpu.detector.cluster import _DIRS, MIN_SAME_NEIGHBORS

    offsets = list(_OFFSETS_ALL) + list(_OFFSETS_WHITE)

    def kernel(gray_ref, black_ref, white_ref, payload_ref):
        g = gray_ref[:].astype(jnp.int32)
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        tmin = _tile_stat(g, "min", row_idx, col_idx, h, w)
        tmax = _tile_stat(g, "max", row_idx, col_idx, h, w)
        tmin = _neighborhood3_tiles(tmin, "min", row_idx, col_idx, h, w)
        tmax = _neighborhood3_tiles(tmax, "max", row_idx, col_idx, h, w)
        contrast = tmax - tmin
        thresh = tmin + contrast // 2
        val = jnp.where(g > thresh, jnp.int32(255), jnp.int32(0))
        val = jnp.where(contrast < min_diff, jnp.int32(127), val)
        labels = _ccl_from_val(val, h, w, iters, offsets)
        blacks, whites, payloads = _extract_candidates(
            val, labels, h, w, row_idx, col_idx, _DIRS, MIN_SAME_NEIGHBORS
        )
        for di in range(len(_DIRS)):
            black_ref[di] = blacks[di]
            white_ref[di] = whites[di]
            payload_ref[di] = payloads[di]

    return kernel


# Budget for the extract-fused kernel: its live set adds the solid stencil
# and six [h, w] i32 candidate pages on top of the plain fused kernel's
# (~88-96 B/px). Measured headroom determines the cap; conservative start
# at the deployed decimate-2 geometry (652x800 = 521k px) which is the
# production target for this path.
EXTRACT_BLOCK_MAX_PIXELS = 540_000


def _vmem_limit_bytes_extract(h: int, w: int) -> int:
    wp = -(-w // 128) * 128
    return max(24 * 1024 * 1024, min(h * wp * 152, 127 * 1024 * 1024))


import functools


@functools.lru_cache(maxsize=1)
def extract_kernel_compiles() -> bool:
    """One tiny Mosaic compile probe (cached per process, warm in the
    persistent XLA compile cache across restarts): if this TPU backend
    rejects the extract-fused kernel, the detector self-heals onto the
    two-stage path instead of failing every pipeline build (same pattern
    as the segment kernel's probe, detector/cluster.py)."""
    try:
        g = jnp.zeros((1, 8, 128), jnp.uint8)
        threshold_ccl_extract_pallas.lower(g, iters=2).compile()
        return True
    except Exception:  # Mosaic/compile errors are backend-specific
        return False


@partial(jax.jit, static_argnames=("iters", "min_diff", "interpret"))
def threshold_ccl_extract_pallas(gray: jax.Array, iters: int = 12,
                                 min_diff: int = 5, interpret: bool = False):
    """Fused threshold + CCL + candidate extraction. gray [B, H, W] u8
    (H, W multiples of 4) -> (black, white, payload), each [B, 2*H*W] i32
    in the exact dir-major enumeration order of
    ``cluster.extract_boundary_points`` (bit-identical by test)."""
    b, h, w = gray.shape
    assert h % 4 == 0 and w % 4 == 0
    kernel = _make_fused_extract_kernel(h, w, iters, min_diff)
    out_spec = pl.BlockSpec((None, 2, h, w), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, 2, h, w), jnp.int32)
    black, white, payload = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes_extract(h, w)
        ),
        interpret=interpret,
    )(gray)
    return (black.reshape(b, -1), white.reshape(b, -1),
            payload.reshape(b, -1))


def _make_blocked_extract_kernel(hext, wp, k, hb):
    """Boundary-candidate extraction over ONE row block with halos: tern
    and labels arrive as [hb + 3, wp] pages (1 halo row above the core, 2
    below — the solidity stencil reaches 1 row and a core last-row
    down-edge needs the below row's solidity), candidate pages leave as
    the core's [2, hb, wp] slices. Globalized y coordinates make the
    assembled output bit-identical to the whole-frame jnp extraction."""
    from chalkydri_tpu.detector.cluster import _DIRS, MIN_SAME_NEIGHBORS

    def kernel(tern_ref, lab_ref, black_ref, white_ref, payload_ref):
        blk = pl.program_id(0) % k
        val = tern_ref[:].astype(jnp.int32)
        labels = lab_ref[:]
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (hext, wp), 0)
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (hext, wp), 1)
        blacks, whites, payloads = _extract_candidates(
            val, labels, hext, wp, row_idx, col_idx, _DIRS,
            MIN_SAME_NEIGHBORS, core_top=1, core_bottom=2,
            y_offset=blk * hb,
        )
        for di in range(len(_DIRS)):
            black_ref[di] = blacks[di][1:1 + hb, :]
            white_ref[di] = whites[di][1:1 + hb, :]
            payload_ref[di] = payloads[di][1:1 + hb, :]

    return kernel


# Per-block pixel budget for the blocked extract kernel: the live set is
# the whole-frame extract kernel's (~152 B/px) without the CCL scan
# temporaries; conservative reuse of the same ceiling.
_EXTRACT_ROWBLOCK_MAX_PIXELS = 500_000


@functools.lru_cache(maxsize=1)
def blocked_extract_kernel_compiles() -> bool:
    """Tiny Mosaic compile probe for the blocked extract kernel (same
    self-heal pattern as ``extract_kernel_compiles``): backends that
    reject it fall back to the jnp extraction."""
    try:
        t = jnp.full((1, 8, 128), 127, jnp.uint8)
        l = jnp.full((1, 8, 128), INVALID, jnp.int32)
        extract_candidates_blocked_pallas.lower(t, l).compile()
        return True
    except Exception:  # Mosaic/compile errors are backend-specific
        return False


@partial(jax.jit, static_argnames=("block_rows", "interpret"))
def extract_candidates_blocked_pallas(
    tern: jax.Array,
    labels: jax.Array,
    block_rows: int | None = None,
    interpret: bool = False,
):
    """Boundary-candidate extraction for frames beyond the single-block
    VMEM budget: tern u8 / labels i32 [B, H, W] (the ``threshold_ccl_blocked``
    outputs) -> (black, white, payload) [B, 2*H*W] int32, bit-identical to
    ``cluster.extract_boundary_points`` (tested): each row block's
    stencils run on the VPU over VMEM-resident pages, with 3 halo rows of
    host-assembled context per block.

    NOT selected by the production pipeline — measured 3.3 ms vs the jnp
    extraction's 1.0 ms for extract+compact at 1304x1600 batch-2 on v5e:
    XLA fuses the jnp shifts straight into the compaction's reductions,
    while this standalone kernel pays full HBM round-trips for six dense
    int32 candidate pages. Extraction only wins fused INTO the labeling
    kernel (threshold_ccl_extract_pallas, the whole-frame emitter); this
    kernel and its halo/y_offset extraction semantics are kept as the
    tested building block for a future fused final-propagation emitter on
    the blocked path.
    """
    b, h, w = tern.shape
    wp = (w + 127) // 128 * 128
    hb = _pick_block_rows(h, wp) if block_rows is None else block_rows
    hb = min(hb, max(8, _EXTRACT_ROWBLOCK_MAX_PIXELS // wp // 4 * 4))
    assert hb % 4 == 0
    k = -(-h // hb)
    hp = k * hb
    hext = hb + 3

    tern_p = tern
    if hp != h or wp != w:
        tern_p = jnp.pad(tern, ((0, 0), (0, hp - h), (0, wp - w)),
                         constant_values=127)
    labels_p = labels
    if hp != h or wp != w:
        labels_p = jnp.pad(labels, ((0, 0), (0, hp - h), (0, wp - w)),
                           constant_values=INVALID)

    def with_halos(x, fill):
        xb = x.reshape(b, k, hb, wp)
        f1 = jnp.full((b, 1, 1, wp), fill, x.dtype)
        top = jnp.concatenate([f1, xb[:, :-1, -1:, :]], axis=1)
        f2 = jnp.full((b, 1, 2, wp), fill, x.dtype)
        bot = jnp.concatenate([xb[:, 1:, :2, :], f2], axis=1)
        return jnp.concatenate([top, xb, bot], axis=2).reshape(
            b * k, hext, wp)

    tern_ext = with_halos(tern_p, jnp.uint8(127))
    labels_ext = with_halos(labels_p, INVALID)

    kernel = _make_blocked_extract_kernel(hext, wp, k, hb)
    out_spec = pl.BlockSpec(
        (None, 2, hb, wp), lambda i, k=k: (i // k, 0, i % k, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((b, 2, hp, wp), jnp.int32)
    black, white, payload = pl.pallas_call(
        kernel,
        grid=(b * k,),
        in_specs=[
            pl.BlockSpec((None, hext, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hext, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes_extract(hext, wp)
        ),
        interpret=interpret,
    )(tern_ext, labels_ext)

    def strip(x):
        return x[:, :, :h, :w].reshape(b, -1)

    return strip(black), strip(white), strip(payload)


def _vmem_limit_bytes(h: int, w: int, bpp: int = 96) -> int:
    """Scoped-VMEM budget for a whole-frame kernel block: ~96 B per
    LANE-PADDED pixel (the measured live set is ~88 B/px at 652x800 —
    that frame compiles and runs at a 48 MB cap on v5e; margin on top),
    floored at the historical 24 MB setting. v5e executes 48 MB scoped
    budgets fine; the cap grows only with frame size, and frames beyond
    SINGLE_BLOCK_MAX_PIXELS take the row-blocked path instead.

    ``bpp``: the blocked path's kernels pass 128 — their re-bracketed
    convergence loop (``final_cond=True``) stacks the closing cond's scan
    temporaries next to the while body's (compile-probed on v5e: 120 B/px
    OOMs, 128 compiles). Their blocks are <= 512k px so the worst-case
    cap is ~64 MiB, far from the 128 MiB ceiling the whole-frame kernels
    flirt with."""
    wp = -(-w // 128) * 128
    return max(24 * 1024 * 1024, h * wp * bpp)


@partial(jax.jit, static_argnames=("iters", "interpret"))
def label_components_pallas(tern: jax.Array, iters: int = 12,
                            interpret: bool = False) -> jax.Array:
    """Drop-in for ``segment.label_components`` on TPU. tern [B, H, W] u8."""
    b, h, w = tern.shape
    kernel = _make_kernel(h, w, iters)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (None, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes(h, w)
        ),
        interpret=interpret,
    )(tern)


@partial(jax.jit, static_argnames=("iters", "min_diff", "interpret"))
def threshold_ccl_pallas(gray: jax.Array, iters: int = 12, min_diff: int = 5,
                         interpret: bool = False):
    """Fused adaptive threshold + CCL. gray [B, H, W] u8 (H, W multiples of
    4) -> (tern u8, labels i32), both [B, H, W]."""
    b, h, w = gray.shape
    assert h % 4 == 0 and w % 4 == 0
    kernel = _make_fused_kernel(h, w, iters, min_diff)
    labels, tern = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), jnp.int32),
            jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
        ),
        # The kernel's live set scales with the frame (~88 B per padded
        # pixel measured at 652x800); size the scoped-vmem cap to match.
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes(h, w)
        ),
        interpret=interpret,
    )(gray)
    return tern, labels


# ---------------------------------------------------------------------------
# Blocked CCL for frames too large for a single-block VMEM kernel
# ---------------------------------------------------------------------------
#
# The fused single-block kernel needs the whole frame resident in VMEM
# (~88-96 B/padded-pixel live set). With the scoped-VMEM cap sized to the
# frame (_vmem_limit_bytes), v5e (128 MB VMEM) executes single-block
# frames up to ~1.03M pixels — the reference's deployed 1600x1304
# geometry at quad_decimate=2 (652x800) runs single-block at 0.97 ms vs
# 1.84 ms blocked, and 800x1280 (quad_decimate=1 for 1280x800 cameras)
# at 1.77 ms vs 4.74 ms (batch-2, RTT-corrected). Beyond that (full-res
# megapixel frames, e.g. 1304x1600 = 2.09M px) the live set exceeds
# VMEM, and the frame is split into aligned ROW BLOCKS:
#
#   1. jnp adaptive threshold over the full frame (stencil ops, HBM-bound,
#      no VMEM pressure),
#   2. one Pallas pass per block (sequential grid) propagating labels to
#      block-local convergence from a global flat-index initialization,
#   3. a jnp seam merge: neighbor-min across each block boundary row
#      (4-conn all + diagonals white-only, same rule as in-kernel),
#   4. repeat 2-3 until a fixed point (convergence-gated while_loop; a
#      component spanning k blocks needs <= k rounds).
#
# This is the single-device instance of the SURVEY.md section 5.7 structure:
# parallel/sharded_stages.py does the same merge over ICI seams between
# chips; here the seams are VMEM block boundaries on one core.

# Validated on-device (v5e has 128 MB VMEM; the scoped cap is sized per
# frame by _vmem_limit_bytes): 652x800 (521,600 px) runs at a 48 MB cap,
# partition-identical to the blocked path, 1.9x faster; 800x1280
# (1,024,000 px — the quad_decimate=1 path for 1280x800 cameras) runs at
# a 100 MB cap, bitwise equal to the jnp path, 2.7x faster than blocked
# (1.77 vs 4.74 ms batch-2). Beyond ~1.03M px (e.g. full-res 1600x1304,
# 2.09M px -> a ~200 MB live set) the frame must be blocked.
SINGLE_BLOCK_MAX_PIXELS = 1_030_000  # fused single-block kernel budget (v5e)
_BLOCK_PIXEL_BUDGET = 512 * 1024  # per-block pixels for the blocked path


def _pick_block_rows(h: int, wp: int) -> int:
    """Balanced block height: the smallest block COUNT whose even split
    (rounded up to an 8-multiple) fits the per-block pixel budget.

    Fewer blocks need fewer seam-merge rounds, and balancing the split
    avoids padding dead rows: the old densest-fit rule gave the deployed
    1600x1304 geometry at quad_decimate=2 (800x656 after padding) blocks
    of 392 rows -> 3 blocks padded to 1176 rows, 47% wasted VPU work; the
    balanced split is 3x272 = 816 rows. Padded rows are 'skip' pixels but
    the fixed-shape kernel still runs every propagation round over them.
    """
    max_hb = max(8, (_BLOCK_PIXEL_BUDGET // wp) // 8 * 8)
    if h <= max_hb:
        return h
    k = -(-h // max_hb)
    hb = -(-h // k)  # balanced rows per block; its 8-multiple <= max_hb
    return (hb + 7) // 8 * 8


# Loop bracket for the blocked path's kernels (see _ccl_from_val's
# ``final_cond``): True skips the confirming round's scan set on a
# convergence exit at the price of a larger per-block VMEM live set
# (~128 vs ~96 B/px — fine for <= 512k px blocks). Module-level so A/B
# perf probes can flip it; clear the jit caches after changing it.
BLOCKED_FINAL_COND = True


def _make_prop_kernel(h, w, iters, label_bound=None):
    """CCL propagation kernel taking an initial labeling as input. Also
    emits a per-block convergence flag page (1 iff the in-kernel loop hit
    its fixed point rather than the ``iters`` cap) — the two-phase merge's
    exactness certificate. ``label_bound``: exclusive bound on incoming
    label values (the padded frame's pixel count for the blocked merge) —
    lets the per-axis packed scans engage where the bits fit."""
    offsets = list(_OFFSETS_ALL) + list(_OFFSETS_WHITE)

    def kernel(tern_ref, lab_ref, out_ref, conv_ref):
        val = tern_ref[:].astype(jnp.int32)
        labels, conv = _ccl_from_val(val, h, w, iters, offsets,
                                     labels0=lab_ref[:], want_converged=True,
                                     final_cond=BLOCKED_FINAL_COND,
                                     label_bound=label_bound)
        out_ref[:] = labels
        conv_ref[:] = jnp.full((8, 128), conv, jnp.int32)

    return kernel


def _make_fused_blocked_kernel(hb, wp, k, h_true, w_true, iters, min_diff):
    """Round-0 kernel for the blocked path: gray block -> (labels, tern).

    The adaptive threshold runs block-locally on the VMEM-resident gray
    (same tile semantics as the single-block fused kernel), with two
    corrections that make it bit-identical to the full-frame jnp
    ``adaptive_threshold``:

    - pixels beyond the TRUE image extent (lane/row padding) enter the
      tile stats as neutral elements (255 for min, 0 for max) — exactly
      the reduce_window init padding the jnp path sees at image edges —
      and classify to 'skip';
    - the 3x3-tile dilation's missing row at each block seam is supplied
      by the host: ``nbr_ref`` carries the neighbor block's col-dilated
      edge tile-stat rows (rows 0-3 = min_top, max_top, min_bot,
      max_bot at pixel lane resolution), min/max-folded into the local
      dilation for the block's first/last pixel-tile row. Separability
      of the 3x3 min/max makes the fold exact.

    Labels initialize in-kernel to the pixel's flat index in the PADDED
    frame (block index from ``pl.program_id``), matching
    ``label_components_blocked_pallas``'s global initialization.
    """
    offsets = list(_OFFSETS_ALL) + list(_OFFSETS_WHITE)

    def kernel(gray_ref, nbr_ref, labels_ref, tern_ref, conv_ref):
        blk = pl.program_id(0) % k
        g = gray_ref[:].astype(jnp.int32)
        nbr = nbr_ref[:]
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (hb, wp), 0)
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (hb, wp), 1)
        grow = blk * hb + row_idx
        valid_px = (col_idx < w_true) & (grow < h_true)
        gmin = jnp.where(valid_px, g, jnp.int32(255))
        gmax = jnp.where(valid_px, g, jnp.int32(0))
        tmin = _tile_stat(gmin, "min", row_idx, col_idx, hb, wp)
        tmax = _tile_stat(gmax, "max", row_idx, col_idx, hb, wp)
        tmin = _neighborhood3_tiles(tmin, "min", row_idx, col_idx, hb, wp)
        tmax = _neighborhood3_tiles(tmax, "max", row_idx, col_idx, hb, wp)
        tmin = jnp.where(row_idx < 4, jnp.minimum(tmin, nbr[0:1, :]), tmin)
        tmax = jnp.where(row_idx < 4, jnp.maximum(tmax, nbr[1:2, :]), tmax)
        tmin = jnp.where(
            row_idx >= hb - 4, jnp.minimum(tmin, nbr[2:3, :]), tmin)
        tmax = jnp.where(
            row_idx >= hb - 4, jnp.maximum(tmax, nbr[3:4, :]), tmax)
        contrast = tmax - tmin
        thresh = tmin + contrast // 2
        val = jnp.where(g > thresh, jnp.int32(255), jnp.int32(0))
        val = jnp.where(contrast < min_diff, jnp.int32(127), val)
        val = jnp.where(valid_px, val, jnp.int32(127))
        tern_ref[:] = val.astype(jnp.uint8)
        # Round 0 propagates BLOCK-LOCAL flat labels (labels0=None) so the
        # PACKED segmented scans engage (~2x fewer VPU ops per scan step
        # than the tuple path): local labels need ceil(log2(hb*wp)) bits
        # (<= 20 for 512k-px blocks) + seg bits <= 11, inside the 31-bit
        # packing budget, while global labels (21+ bits) are not. The
        # global labeling is recovered AFTER propagation by adding the
        # block's constant offset: every label in the block carries the
        # same offset, and min-propagation commutes with adding a
        # constant, so offset(min-fixed-point(local)) ==
        # min-fixed-point(offset(local)) — the exact labeling
        # label_components_blocked_pallas initializes globally.
        labels, conv = _ccl_from_val(val, hb, wp, iters, offsets,
                                     want_converged=True,
                                     final_cond=BLOCKED_FINAL_COND)
        labels_ref[:] = jnp.where(
            labels == INVALID, INVALID, labels + blk * hb * wp
        )
        conv_ref[:] = jnp.full((8, 128), conv, jnp.int32)

    return kernel


def _blocked_boundary_rows(gray_p, h_true, w_true, hb):
    """Host-side prep for the fused blocked kernel: for every block, the
    col-dilated tile-stat rows it needs from its row neighbors, at pixel
    lane resolution. gray_p [B, hp, wp] u8 (padded) -> [B*k, 8, wp] i32
    (rows 0-3 = min_top, max_top, min_bot, max_bot; 4-7 unused padding to
    the sublane tile).

    Only the 8 pixel rows STRADDLING each seam contribute (the tile row
    just above and just below it), so the stats are computed on a
    [B, 8*(k-1), wp] strip of static row slices instead of the whole
    frame — the full-frame version measured 1.11 ms at 1304x1600 batch-2
    on v5e for what is ~32 rows of real work. Column dilation is along
    the lane axis only, so stacking seam strips in the row axis cannot
    leak stats across seams; exactness vs the jnp threshold is pinned by
    the fused-threshold bitwise tests."""
    import numpy as _np

    b, hp, wp = gray_p.shape
    k = hp // hb
    w4 = wp // 4
    i32 = jnp.int32
    if k <= 1:
        return jnp.concatenate(
            [jnp.full((b, 1, wp), 255, i32), jnp.zeros((b, 1, wp), i32),
             jnp.full((b, 1, wp), 255, i32), jnp.zeros((b, 1, wp), i32),
             jnp.zeros((b, 4, wp), i32)], axis=1,
        )
    # Seam strip: for seam s (between blocks s-1 and s), pixel rows
    # [s*hb-4, s*hb+4) — tile rows s*tb-1 (above) and s*tb (below).
    strip = jnp.concatenate(
        [gray_p[:, s * hb - 4: s * hb + 4, :] for s in range(1, k)], axis=1
    ).astype(i32)
    row_ids = _np.array(
        [s * hb - 4 + r for s in range(1, k) for r in range(8)]
    )
    valid_row = jnp.asarray(row_ids < h_true)  # [8(k-1)]
    col_ok = (
        jax.lax.broadcasted_iota(i32, (1, 1, wp), 2) < w_true
    )
    valid = valid_row[None, :, None] & col_ok
    gmin = jnp.where(valid, strip, i32(255))
    gmax = jnp.where(valid, strip, i32(0))
    # reduce_window, NOT the 5-D reshape reduction: a size-4 dim in the
    # lane axis costs ~4x on v5e (docs/performance.md lesson sheet).
    tile4 = dict(window_dimensions=(1, 4, 4), window_strides=(1, 4, 4),
                 padding="VALID")
    tmin = jax.lax.reduce_window(gmin, i32(255), jax.lax.min, **tile4)
    tmax = jax.lax.reduce_window(gmax, i32(0), jax.lax.max, **tile4)
    pad3 = [(0, 0), (0, 0), (1, 1)]
    cmin = jax.lax.reduce_window(
        tmin, i32(255), jax.lax.min, (1, 1, 3), (1, 1, 1), pad3)
    cmax = jax.lax.reduce_window(
        tmax, i32(0), jax.lax.max, (1, 1, 3), (1, 1, 1), pad3)
    # cmin/cmax rows: [2s] = above seam s+1, [2s+1] = below seam s+1.
    above = slice(0, 2 * (k - 1), 2)
    below = slice(1, 2 * (k - 1), 2)

    def pick(arr, rows, fill, at_front):
        sel = arr[:, rows]
        edge = jnp.full((b, 1, w4), fill, arr.dtype)
        parts = [edge, sel] if at_front else [sel, edge]
        return jnp.concatenate(parts, axis=1)  # [b, k, wp/4]

    min_top = pick(cmin, above, 255, True)
    max_top = pick(cmax, above, 0, True)
    min_bot = pick(cmin, below, 255, False)
    max_bot = pick(cmax, below, 0, False)
    nbr = jnp.stack([min_top, max_top, min_bot, max_bot], axis=2)
    nbr = jnp.repeat(nbr, 4, axis=-1)  # tile -> pixel lanes
    nbr = jnp.concatenate(
        [nbr, jnp.zeros_like(nbr)], axis=2)  # pad 4 -> 8 sublanes
    return nbr.reshape(b * k, 8, wp)


def _shift_row(x, dx, fill):
    """Shift [..., W] rows along the last axis with edge fill."""
    if dx == 0:
        return x
    out = jnp.roll(x, dx, axis=-1)
    if dx > 0:
        return out.at[..., :dx].set(fill)
    return out.at[..., dx:].set(fill)


def _seam_merge(labels, tern, hb):
    """Neighbor-min across row-block boundary rows (jnp, cheap: touches
    2*(k-1) rows). Connectivity matches the kernel: vertical for any same
    value, diagonals for white pixels only."""
    b, h, w = labels.shape
    k = h // hb
    if k <= 1:
        return labels
    lab = labels.reshape(b, k, hb, w)
    val = tern.reshape(b, k, hb, w)
    bot_l, top_l = lab[:, :-1, -1], lab[:, 1:, 0]  # [b, k-1, w]
    bot_v, top_v = val[:, :-1, -1], val[:, 1:, 0]

    def upd(row_l, row_v, o_l, o_v):
        m = row_l
        valid = row_v != 127
        white = row_v == 255
        for dx in (0, 1, -1):
            nl = _shift_row(o_l, dx, INVALID)
            nv = _shift_row(o_v, dx, jnp.uint8(127))
            same = (nv == row_v) & valid
            if dx != 0:
                same = same & white
            m = jnp.minimum(m, jnp.where(same, nl, INVALID))
        return m

    new_bot = upd(bot_l, bot_v, top_l, top_v)
    new_top = upd(top_l, top_v, bot_l, bot_v)
    lab = lab.at[:, :-1, -1].set(new_bot).at[:, 1:, 0].set(new_top)
    return lab.reshape(b, h, w)


def _seam_solve_relabel(labels, tern, hb):
    """Rewrite every block-seam row with its component's GLOBAL min label.

    The key fact behind the two-phase merge: after block-local convergence,
    every piece of a multi-block component exposes its block-local min
    label on EVERY seam-row pixel it touches (block propagation spreads
    the piece min to all its pixels), and a piece unreachable from a seam
    cannot connect to another block — so the component's global min is
    computable from the 2*(k-1) seam rows ALONE (~13k entries for a
    1304x1600 frame vs 2M pixels). One final block-local propagation then
    yields the global fixed point for any component topology the solve
    fully resolves; topologies that exceed its round cap are caught by the
    caller's certificate check and finish in extra outer rounds.

    The solver is a SORTED-RUN RELAXATION, chosen for the TPU cost model:
    a first-cut FastSV-style union-find (searchsorted + scatter-min parent
    table) measured 735 ms at 1304x1600 batch-2 on v5e — value-space
    gathers at ~60 ns/element made every hook/jump round cost more than a
    whole frame propagation. Instead:

    - ONE argsort groups equal labels into contiguous runs ("same piece"
      is a label-EQUALITY relation here: round-0 labels are block-disjoint
      flat indices, and later rounds only ever replace labels with other
      labels of the same component, so equal value <=> same piece/component
      fragment, across the whole strip).
    - Each round then needs only shifts and log-depth segmented min scans:
      relax seam edges in POSITION order (vertical same-ternary, diagonal
      white-only — exactly ``_seam_merge``'s rule), take run minima in
      SORTED order, and move between the two orders with the fixed
      permutation via rowsel_gather_batched (the repo's lane-select
      gather; the only gathers in the loop, 2 x n elements per round).
    - Information crosses >= one seam edge per round and unions whole
      pieces instantly, so the round count is the piece-graph eccentricity
      of each component's min label — <= k-1 for anything that does not
      zig-zag between blocks; the cap ``s + 2`` covers those, and the
      convergence-gated exit makes realistic scenes (diameter <= 2) pay
      2-3 rounds.

    At the relaxation's fixed point every edge joins equal values and
    every run is uniform, so connected seam nodes all carry their
    component's min (monotone descent from the initial labels, bounded
    below by the component min, which is itself a node value). A capped
    (non-converged) exit still returns monotone, component-consistent
    labels — the caller re-propagates and re-solves.
    """
    b, hp, wp = labels.shape
    k = hp // hb
    if k <= 1:
        return labels
    from chalkydri_tpu.ops.gather import rowsel_gather_batched

    lab = labels.reshape(b, k, hb, wp)
    val = tern.reshape(b, k, hb, wp)
    bot_l, top_l = lab[:, :-1, -1], lab[:, 1:, 0]  # [b, s, wp]
    bot_v, top_v = val[:, :-1, -1], val[:, 1:, 0]

    s = k - 1
    n = 2 * s * wp  # 128-aligned (wp is), as rowsel_gather requires

    v0 = jnp.concatenate(
        [bot_l.reshape(b, -1), top_l.reshape(b, -1)], axis=1)  # [b, n]
    perm = jnp.argsort(v0, axis=1).astype(jnp.int32)
    vs = jnp.sort(v0, axis=1)  # == v0[perm], without the gather
    inv = jnp.argsort(perm, axis=1).astype(jnp.int32)
    segid = jnp.cumsum(
        jnp.concatenate(
            [jnp.ones((b, 1), jnp.int32),
             (vs[:, 1:] != vs[:, :-1]).astype(jnp.int32)], axis=1),
        axis=1)

    valid_b, white_b = bot_v != 127, bot_v == 255
    valid_t, white_t = top_v != 127, top_v == 255

    def relax_rows(row_cur, row_v, valid, white, o_cur, o_v):
        m = row_cur
        for dx in (0, 1, -1):
            nl = _shift_row(o_cur, dx, INVALID)
            nv = _shift_row(o_v, dx, jnp.uint8(127))
            same = (nv == row_v) & valid
            if dx != 0:
                same = same & white
            m = jnp.minimum(m, jnp.where(same, nl, INVALID))
        return m

    def seg_allmin(x):
        """Every element -> min over its equal-label run (fwd+bwd
        log-doubling segmented min scans; INVALID acts as +inf)."""
        fwd = bwd = x
        d = 1
        while d < n:
            pad_v = jnp.full((b, d), INVALID, x.dtype)
            pad_f = jnp.full((b, d), -1, jnp.int32)
            sh = jnp.concatenate([pad_v, fwd[:, :-d]], axis=1)
            sid = jnp.concatenate([pad_f, segid[:, :-d]], axis=1)
            fwd = jnp.minimum(fwd, jnp.where(sid == segid, sh, INVALID))
            sh = jnp.concatenate([bwd[:, d:], pad_v], axis=1)
            sid = jnp.concatenate([segid[:, d:], pad_f], axis=1)
            bwd = jnp.minimum(bwd, jnp.where(sid == segid, sh, INVALID))
            d *= 2
        return jnp.minimum(fwd, bwd)

    t_rounds = max(4, s + 2)

    def body(c):
        i, cur, _ = c
        cb = cur[:, : s * wp].reshape(b, s, wp)
        ct = cur[:, s * wp:].reshape(b, s, wp)
        eb = relax_rows(cb, bot_v, valid_b, white_b, ct, top_v)
        et = relax_rows(ct, top_v, valid_t, white_t, cb, bot_v)
        e = jnp.concatenate([eb.reshape(b, -1), et.reshape(b, -1)], axis=1)
        ms = seg_allmin(rowsel_gather_batched(e, perm))
        cur2 = rowsel_gather_batched(ms, inv)
        return i + 1, cur2, jnp.any(cur2 != cur)

    _, cur, _ = jax.lax.while_loop(
        lambda c: c[2] & (c[0] < t_rounds), body,
        (jnp.int32(0), v0, jnp.bool_(True)),
    )

    new_bot = cur[:, : s * wp].reshape(b, s, wp)
    new_top = cur[:, s * wp:].reshape(b, s, wp)
    lab = lab.at[:, :-1, -1].set(new_bot).at[:, 1:, 0].set(new_top)
    return lab.reshape(b, hp, wp)


def _merge_two_phase(tern_p, labels, conv, hb, iters, merge_rounds,
                     interpret):
    """Two-phase merge: seam-equivalence relabel + ONE re-propagation.

    ``labels``/``conv`` are the round-0 block-propagation output. The loop
    body is exact in a single iteration whenever the propagation kernels
    certify their in-kernel fixed points (``conv`` — true for ordinary
    scenes at the default ``iters``; false on percolation-class contrast
    floods, where blocks hold giant fractal components); the
    convergence-gated outer loop only repeats when a kernel hit its
    iteration cap or the seam solve hit its round cap. Exit needs no
    confirmation pass: relabel-changed-nothing + both-kernels-certified IS
    the global fixed-point certificate. See
    ``label_components_blocked_pallas`` for the measured trade-off vs the
    default "rounds" merge.
    """
    relabeled = _seam_solve_relabel(labels, tern_p, hb)
    done = jnp.all(relabeled == labels) & conv

    def cond(c):
        i, _, _, done = c
        return (~done) & (i < merge_rounds)

    def body(c):
        i, _, rel, _ = c
        new, conv2 = _blocked_propagate(tern_p, rel, hb, iters, interpret)
        rel2 = _seam_solve_relabel(new, tern_p, hb)
        return i + 1, new, rel2, jnp.all(rel2 == new) & conv2

    # The carry keeps both the last PROPAGATED labels (what we return —
    # always block-locally consistent, even if the merge_rounds latency
    # cap fires mid-merge) and the relabeled seed for the next pass.
    _, labels, _, done = jax.lax.while_loop(
        cond, body, (jnp.int32(0), labels, relabeled, done)
    )
    return labels, done


def _blocked_propagate(tern, labels, hb, iters, interpret):
    """One block-local propagation pass. Returns (labels [b, h, w],
    converged [] bool — True iff EVERY block certified its fixed point)."""
    b, h, w = tern.shape
    k = h // hb
    # label_bound=h*w would let the col scan pack (22 + 9 bits at
    # 1304x1600), but it measured SLOWER here: the packed scan's
    # segment-index prefix counts are per-invocation setup, and merge
    # re-propagations converge in 1-3 rounds — too few to amortize it
    # (merge 1.26 -> 1.61 ms measured on v5e). Round 0 runs ~8-12 rounds,
    # which is why packing pays there. Tuple scans stay for the merge.
    kernel = _make_prop_kernel(hb, w, iters)
    out, conv = pl.pallas_call(
        kernel,
        grid=(b * k,),
        in_specs=[
            pl.BlockSpec((None, hb, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hb, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, hb, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * k, hb, w), jnp.int32),
            jax.ShapeDtypeStruct((b * k, 8, 128), jnp.int32),
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes(hb, w, bpp=128)
        ),
        interpret=interpret,
    )(tern.reshape(b * k, hb, w), labels.reshape(b * k, hb, w))
    return out.reshape(b, h, w), jnp.all(conv[:, 0, 0] == 1)


@partial(jax.jit, static_argnames=("iters", "block_rows", "merge_rounds",
                                   "merge", "interpret", "want_converged"))
def label_components_blocked_pallas(
    tern: jax.Array,
    iters: int = 12,
    block_rows: int | None = None,
    merge_rounds: int | None = None,
    merge: str = "hybrid",
    interpret: bool = False,
    want_converged: bool = False,
) -> jax.Array:
    """CCL over row blocks with a cross-seam merge. tern [B, H, W] u8.

    Labels are flat indices in the PADDED frame (opaque ids — the cluster
    stage only compares them for equality).

    ``merge="rounds"``: seam neighbor-min + full re-propagation per round
    until the global fixed point or the ``merge_rounds`` cap (default
    4*k + 2). Each round moves min-label information across at least one
    seam along its path, so pathological serpentine topologies can need
    more rounds than the cap; realistic scenes (tag borders cross a seam
    at most twice) converge in 2-3. Measured 1304x1600 batch-2 on v5e
    (round 5, with the seam-first exit): 3.36 ms total, 0.95 ms of it
    merge.

    ``merge="twophase"``: one block-local propagation, an exact seam-row
    equivalence solve (_seam_solve_relabel), one final propagation —
    CERTIFIED exact in one outer round for any component topology
    (including serpentines past the rounds-mode cap) whenever the
    propagation kernels certify their in-kernel fixed points. Bitwise
    equal to "rounds" at full convergence (tested). NOT the default
    because it measures slightly slower on realistic scenes (6.27 ms —
    two relabels at ~0.8 ms outweigh the saved propagation) and much
    slower on percolation-class inputs (full-frame salt-and-pepper
    contrast, where block propagation at the production ``iters`` never
    certifies and every capped outer round pays a full prop+relabel).
    Use it where exactness on adversarial topology matters more than
    worst-case latency.

    ``merge="hybrid"`` (production default, round 5): rounds-mode for
    k+1 rounds, then ONE two-phase pass iff still unconverged — benign
    scenes pay exactly the rounds cost (measured 3.44 vs 3.36 ms, the
    difference the certificate plumbing), serpentines are bounded by
    rounds_budget + one seam solve instead of the 4*k+2 rounds cap (see
    _merge_hybrid). Bitwise equal to both pure modes at full convergence
    (tested).
    """
    b, h, w = tern.shape
    wp = (w + 127) // 128 * 128
    hb = _pick_block_rows(h, wp) if block_rows is None else block_rows
    k = -(-h // hb)
    hp = k * hb
    if merge_rounds is None:
        merge_rounds = 4 * k + 2
    if hp != h or wp != w:
        tern = jnp.pad(tern, ((0, 0), (0, hp - h), (0, wp - w)),
                       constant_values=127)

    valid = tern != 127
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (b, hp, wp), 1) * wp
        + jax.lax.broadcasted_iota(jnp.int32, (b, hp, wp), 2)
    )
    labels = jnp.where(valid, flat, INVALID)
    labels, conv = _blocked_propagate(tern, labels, hb, iters, interpret)
    labels, converged = _merge_blocks(tern, labels, conv, hb, iters,
                                      merge_rounds, merge, interpret)
    if want_converged:
        # the frame-local global-fixed-point certificate (see
        # _merge_blocks) — the multi-chip spatial path's seam-first exit
        return labels[:, :h, :w], converged
    return labels[:, :h, :w]


def _merge_to_fixed_point(tern_p, labels, hb, iters, merge_rounds,
                          interpret, conv0=None):
    """Default merge: seam neighbor-min + re-propagate until the global
    fixed point (or the ``merge_rounds`` latency cap). The alternative
    two-phase merge (_merge_two_phase) reaches the same fixed point with
    a topology-independent round count (tests assert bitwise equality
    between the two) but measured slower on realistic scenes — see
    ``label_components_blocked_pallas``.

    Exit test (round 5): the loop checks the cheap SEAM merge for
    changes BEFORE paying a block propagation, exiting when the seam
    merge is a no-op AND the last propagation certified its in-kernel
    fixed point (``conv``) — seam-consistent + locally-converged IS the
    global fixed point, so this skips the old label-equality exit's
    confirming full propagation (~0.4 ms of the 1.25 ms merge at
    1304x1600 batch-2 on v5e; measured 3.48 -> 3.06 ms total). Same
    fixed point bitwise: the propagation sequence is unchanged, only
    trailing no-op propagations are skipped. ``conv0``: round 0's
    certificate (all blocks locally converged before the first merge);
    defaults to False (forces at least one propagation when the first
    seam merge changes nothing but a block capped out)."""
    if conv0 is None:
        conv0 = jnp.bool_(False)
    m0 = _seam_merge(labels, tern_p, hb)

    def cond(c):
        i, lab, merged, conv = c
        return (i < merge_rounds) & (jnp.any(merged != lab) | ~conv)

    def body(c):
        i, _, merged, _ = c
        new, conv = _blocked_propagate(tern_p, merged, hb, iters, interpret)
        return i + 1, new, _seam_merge(new, tern_p, hb), conv

    _, labels, merged, conv = jax.lax.while_loop(
        cond, body, (jnp.int32(0), labels, m0, conv0)
    )
    # Converged iff the loop exited on its fixed-point test (not the cap):
    # seam merge a no-op AND the last propagation kernel-certified.
    return labels, ~(jnp.any(merged != labels) | ~conv)


def _merge_hybrid(tern_p, labels, conv, hb, iters, merge_rounds, interpret):
    """Counts-aware hybrid merge (the round-5 roadmap item): rounds-mode
    while its convergence certificate holds, ONE two-phase seam-solve pass
    when it fails.

    Benign scenes (tag borders cross a seam at most twice) converge in
    2-3 seam-merge rounds — they pay exactly the rounds-mode cost, none
    of two-phase's ~0.6 ms relabel tax. Pathological topologies
    (serpentines whose min-label path zig-zags between blocks) blow the
    small rounds budget; instead of paying the full 4*k+2 rounds-mode cap
    they fall through to the topology-independent two-phase solve, which
    is certified exact in one outer round whenever the propagation
    kernels certify their fixed points. The rounds budget is k+1 (k =
    block count): any component whose min label travels monotonically
    down/up the block stack resolves within k rounds; needing more IS the
    certificate of a serpentine. Bitwise equal to both pure modes at full
    convergence (tested)."""
    k = tern_p.shape[1] // hb
    # merge_rounds stays the caller's overall merge budget: it clamps the
    # rounds phase (and 0 — "round-0 labels only", the perf probes'
    # convention — disables the merge entirely via _merge_blocks).
    rounds_budget = min(k + 1, merge_rounds)
    m0 = _seam_merge(labels, tern_p, hb)

    def pending(lab, merged, conv):
        return jnp.any(merged != lab) | ~conv

    def cond(c):
        i, lab, merged, conv = c
        return (i < rounds_budget) & pending(lab, merged, conv)

    def body(c):
        i, _, merged, _ = c
        new, conv2 = _blocked_propagate(tern_p, merged, hb, iters, interpret)
        return i + 1, new, _seam_merge(new, tern_p, hb), conv2

    _, labels, merged, conv = jax.lax.while_loop(
        cond, body, (jnp.int32(0), labels, m0, conv)
    )
    return jax.lax.cond(
        pending(labels, merged, conv),
        lambda lab: _merge_two_phase(tern_p, lab, conv, hb, iters,
                                     merge_rounds, interpret),
        lambda lab: (lab, jnp.bool_(True)),
        labels,
    )


def _merge_blocks(tern_p, labels, conv, hb, iters, merge_rounds, merge,
                  interpret):
    """Dispatch between the merge strategies (see
    label_components_blocked_pallas). Returns (labels, converged):
    ``converged`` certifies the frame-local GLOBAL fixed point (the
    multi-chip spatial path uses it to skip confirming propagations
    across ICI seams)."""
    if merge_rounds == 0:
        # round-0 block-local labels only (the perf probes' convention),
        # regardless of strategy; frame-converged only in the
        # single-block case, where block-local IS frame-local.
        k = tern_p.shape[1] // hb
        return labels, (conv if k == 1 else jnp.bool_(False))
    if merge == "twophase":
        return _merge_two_phase(tern_p, labels, conv, hb, iters,
                                merge_rounds, interpret)
    if merge == "hybrid":
        return _merge_hybrid(tern_p, labels, conv, hb, iters, merge_rounds,
                             interpret)
    assert merge == "rounds", f"unknown merge mode {merge!r}"
    return _merge_to_fixed_point(tern_p, labels, hb, iters, merge_rounds,
                                 interpret, conv0=conv)


@partial(jax.jit, static_argnames=("iters", "block_rows", "merge_rounds",
                                   "interpret", "want_converged"))
def propagate_components_blocked(
    tern: jax.Array,
    labels: jax.Array,
    iters: int = 12,
    block_rows: int | None = None,
    merge_rounds: int | None = None,
    interpret: bool = False,
    want_converged: bool = False,
) -> jax.Array:
    """Blocked Pallas propagation from CALLER-provided initial labels to
    the frame-local fixed point (or the ``merge_rounds`` latency cap).
    tern [B, H, W] u8, labels [B, H, W] i32 (INVALID on skip pixels;
    values are opaque ids — any labeling reachable by min-propagation
    from a valid initialization).

    The multi-chip spatial pipeline threads GLOBALLY-offset labels
    through repeated invocations of this function between ICI seam
    merges (parallel/sharded_stages.py) — the same block+seam-merge
    structure the single-device blocked path runs over VMEM block
    boundaries (``label_components_blocked_pallas``), one level up the
    memory hierarchy. Matches the reference's sketched chunked-row
    cluster merge (``crates/chalkydri-apriltags/src/lib.rs:555-613``).
    """
    b, h, w = tern.shape
    wp = (w + 127) // 128 * 128
    hb = _pick_block_rows(h, wp) if block_rows is None else block_rows
    k = -(-h // hb)
    hp = k * hb
    if merge_rounds is None:
        merge_rounds = 4 * k + 2
    tern_p, labels_p = tern, labels
    if hp != h or wp != w:
        tern_p = jnp.pad(tern, ((0, 0), (0, hp - h), (0, wp - w)),
                         constant_values=127)
        labels_p = jnp.pad(labels, ((0, 0), (0, hp - h), (0, wp - w)),
                           constant_values=INVALID)
    labels_p, conv = _blocked_propagate(tern_p, labels_p, hb, iters,
                                        interpret)
    labels_p, converged = _merge_to_fixed_point(
        tern_p, labels_p, hb, iters, merge_rounds, interpret, conv0=conv)
    if want_converged:
        return labels_p[:, :h, :w], converged
    return labels_p[:, :h, :w]


@partial(jax.jit, static_argnames=("iters", "min_diff", "block_rows",
                                   "merge_rounds", "merge", "interpret"))
def threshold_ccl_blocked(
    gray: jax.Array,
    iters: int = 12,
    min_diff: int = 5,
    block_rows: int | None = None,
    merge_rounds: int | None = None,
    merge: str = "hybrid",
    interpret: bool = False,
):
    """Threshold + blocked CCL for frames beyond the single-block VMEM
    budget. gray [B, H, W] u8 (4-multiple dims — pad first if needed) ->
    (tern u8, labels i32).

    The adaptive threshold is FUSED into the round-0 block kernel (the
    full-frame jnp threshold cost 0.94 ms at 1304x1600 batch-2): the host
    prepares only tile-resolution boundary rows (_blocked_boundary_rows),
    and each block computes its tile stats + dilation in VMEM with an
    exact seam correction — bit-identical to
    detector.threshold.adaptive_threshold (tested, incl. interpret mode).
    Merge rounds then run on the kernel-produced tern exactly as before.
    """
    b, h, w = gray.shape
    assert h % 4 == 0 and w % 4 == 0, "pad frames to 4-pixel multiples"
    wp = (w + 127) // 128 * 128
    hb = _pick_block_rows(h, wp) if block_rows is None else block_rows
    assert hb % 4 == 0, "block_rows must be a 4-multiple (tile alignment)"
    k = -(-h // hb)
    hp = k * hb
    if merge_rounds is None:
        merge_rounds = 4 * k + 2
    gray_p = gray
    if hp != h or wp != w:
        gray_p = jnp.pad(gray, ((0, 0), (0, hp - h), (0, wp - w)))

    nbr = _blocked_boundary_rows(gray_p, h, w, hb)
    kernel = _make_fused_blocked_kernel(hb, wp, k, h, w, iters, min_diff)
    labels, tern, conv = pl.pallas_call(
        kernel,
        grid=(b * k,),
        in_specs=[
            pl.BlockSpec((None, hb, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, hb, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hb, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * k, hb, wp), jnp.int32),
            jax.ShapeDtypeStruct((b * k, hb, wp), jnp.uint8),
            jax.ShapeDtypeStruct((b * k, 8, 128), jnp.int32),
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes(hb, wp, bpp=128)
        ),
        interpret=interpret,
    )(gray_p.reshape(b * k, hb, wp), nbr)
    labels = labels.reshape(b, hp, wp)
    tern_p = tern.reshape(b, hp, wp)
    labels, _ = _merge_blocks(tern_p, labels, jnp.all(conv[:, 0, 0] == 1),
                              hb, iters, merge_rounds, merge, interpret)
    return tern_p[:, :h, :w], labels[:, :h, :w]
