"""Spatially-sharded detector stages with explicit halo exchange.

TPU mapping of the reference's intra-frame parallelism (rayon over pixel
columns + sketched chunked-row cluster merging,
``/root/reference/crates/chalkydri-apriltags/src/lib.rs:301-308,555-613``,
SURVEY.md sections 2.4 item 2 and 5.7): frame ROWS are sharded across the
``space`` mesh axis; local-stencil stages (adaptive threshold) compute on
their row block plus a halo of neighbor rows fetched over ICI with
``jax.lax.ppermute`` — the ring-neighbor-exchange structure of sequence
parallelism, applied to the image dimension.

Used for frames too large to stage per-chip (e.g. megapixel multi-camera
stacks); validated against the unsharded stage on a virtual CPU mesh in
tests/test_sharding.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chalkydri_tpu.detector.threshold import MIN_WHITE_BLACK_DIFF, TILE, _tile_minmax

# Halo needed by the threshold stage: the 3x3 tile neighborhood reaches one
# 4-pixel tile into each neighbor's rows.
HALO_ROWS = TILE


def _exchange_halo(block: jax.Array, axis_name: str) -> jax.Array:
    """Concatenate neighbors' boundary rows around the local row block.

    block: [B, Hl, W] (local rows). Returns [B, Hl + 2*HALO, W] with edge
    clamping at the global top/bottom.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    top_rows = block[:, :HALO_ROWS, :]  # my top rows -> neighbor above wants them? no:
    bot_rows = block[:, -HALO_ROWS:, :]

    # Receive the block above's BOTTOM rows (shift downward: src i -> dst i+1)
    from_above = jax.lax.ppermute(
        bot_rows, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    # Receive the block below's TOP rows (shift upward: src i -> dst i-1)
    from_below = jax.lax.ppermute(
        top_rows, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )

    # Edge clamping: shard 0 has no above-neighbor; clamp with its own top
    # row replicated (matches the unsharded reduce_window edge padding).
    clamp_top = jnp.broadcast_to(block[:, :1, :], from_above.shape)
    clamp_bot = jnp.broadcast_to(block[:, -1:, :], from_below.shape)
    from_above = jnp.where(idx == 0, clamp_top, from_above)
    from_below = jnp.where(idx == n - 1, clamp_bot, from_below)

    return jnp.concatenate([from_above, block, from_below], axis=1)


def _threshold_block(gray_ext: jax.Array, min_diff: int) -> jax.Array:
    """Threshold the extended block, returning only the core rows."""
    tmin, tmax = _tile_minmax(gray_ext)

    def nbhd(x, op):
        init = jnp.iinfo(jnp.uint8).max if op == "min" else 0
        fn = jax.lax.min if op == "min" else jax.lax.max
        return jax.lax.reduce_window(
            x, jnp.asarray(init, x.dtype), fn,
            window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
            padding=((0, 0), (1, 1), (1, 1)),
        )

    tmin = nbhd(tmin, "min")
    tmax = nbhd(tmax, "max")
    pmin = jnp.repeat(jnp.repeat(tmin, TILE, axis=1), TILE, axis=2)
    pmax = jnp.repeat(jnp.repeat(tmax, TILE, axis=1), TILE, axis=2)
    contrast = pmax - pmin
    thresh = pmin.astype(jnp.uint16) + contrast.astype(jnp.uint16) // 2
    is_white = gray_ext.astype(jnp.uint16) > thresh
    tern = jnp.where(is_white, jnp.uint8(255), jnp.uint8(0))
    tern = jnp.where(contrast < min_diff, jnp.uint8(127), tern)
    return tern[:, HALO_ROWS:-HALO_ROWS, :]


def sharded_adaptive_threshold(
    gray: jax.Array, mesh: Mesh, min_diff: int = MIN_WHITE_BLACK_DIFF
) -> jax.Array:
    """Adaptive threshold with rows sharded over the 'space' mesh axis and
    batch over 'data'; halo rows ride ICI. Semantically identical to
    ``detector.threshold.adaptive_threshold``."""
    n_space = mesh.shape["space"]
    assert gray.shape[1] % (n_space * TILE) == 0, "rows must split into tiles"

    spec = P("data", "space", None)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=spec,
        out_specs=spec,
    )
    def run(block):
        ext = _exchange_halo(block, "space")
        return _threshold_block(ext, min_diff)

    return run(gray)
