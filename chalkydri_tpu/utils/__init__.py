"""Shared utilities (precision control, profiling helpers).

Loose analogue of the reference's ``chalkydri_core`` prelude
(``/root/reference/crates/chalkydri_core/src/lib.rs:30-36``) — the bits every
layer needs.
"""

from chalkydri_tpu.utils.precision import highest_precision  # noqa: F401
