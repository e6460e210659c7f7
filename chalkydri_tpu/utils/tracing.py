"""Tracing / profiling utilities.

Parity with the reference's observability stack (SURVEY.md section 5.1):
``tracing`` env-filtered logs -> stdlib logging with CHALKYDRI_LOG levels;
per-span timing -> ``span()``; the JAX profiler replaces tokio-console for
device work; latency accounting rides the Tov stamps (runtime/clock.py).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict

_LOG_FORMAT = "%(asctime)s %(levelname)-5s %(name)s: %(message)s"


def init_tracing(default_level: str = "INFO") -> logging.Logger:
    """Env-filtered logging init (the reference reads RUST_LOG,
    crates/chalkydri/src/main.rs:63-69; we read CHALKYDRI_LOG)."""
    level = os.environ.get("CHALKYDRI_LOG", default_level).upper()
    logging.basicConfig(level=getattr(logging, level, logging.INFO),
                        format=_LOG_FORMAT)
    return logging.getLogger("chalkydri")


class SpanStats:
    """Rolling per-span wall-time stats (count / total / max)."""

    def __init__(self):
        self.stats = defaultdict(lambda: [0, 0.0, 0.0])  # n, total_s, max_s

    def record(self, name: str, dt: float) -> None:
        s = self.stats[name]
        s[0] += 1
        s[1] += dt
        s[2] = max(s[2], dt)

    def summary(self) -> dict:
        return {
            k: {"n": n, "mean_ms": tot / n * 1e3 if n else 0.0, "max_ms": mx * 1e3}
            for k, (n, tot, mx) in self.stats.items()
        }


SPANS = SpanStats()


@contextlib.contextmanager
def span(name: str, logger: logging.Logger | None = None):
    """Timed span (the reference's #[instrument] on camera ops,
    pipeline.rs:188-202)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        SPANS.record(name, dt)
        if logger is not None:
            logger.debug("%s took %.3f ms", name, dt * 1e3)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """JAX profiler session -> xplane trace (viewable in TensorBoard /
    XProf); the device-side analogue of tokio-console."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
