"""Structured logging and profiling hooks.

The reference's only observability is per-module ``var verbose`` flags gating
``println``s (SURVEY §5; FeatureCorrelation.scala:28).  The rebuild keeps the
``verbose`` semantics on every factory (printed messages match) and adds:

* a ``strugatzki`` :mod:`logging` logger for structured events,
* :func:`trace` — a span timer context manager,
* :func:`profile` — a JAX device-profiler context writing a TensorBoard
  trace (``jax.profiler``), enabled with ``STRUGATZKI_PROFILE=<dir>``.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

__all__ = ["logger", "trace", "profile"]

logger = logging.getLogger("strugatzki")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s %(message)s"))
    logger.addHandler(_h)
    # own handler + no propagation: embedding apps that configure the root
    # logger must not see every record twice
    logger.propagate = False
    _lvl = os.environ.get("STRUGATZKI_LOG", "WARNING").upper()
    try:
        logger.setLevel(int(_lvl) if _lvl.isdigit() else _lvl)
    except ValueError:
        logger.setLevel(logging.WARNING)
        logger.warning("STRUGATZKI_LOG=%r is not a logging level; "
                       "defaulting to WARNING", _lvl)


@contextlib.contextmanager
def trace(name: str, **fields):
    """Time a span and log it at DEBUG: ``trace('correlate', file=path)``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        extra = " ".join(f"{k}={v}" for k, v in fields.items())
        logger.debug("%s took %.3fs %s", name, dt, extra)


@contextlib.contextmanager
def profile(name: str = "strugatzki"):
    """JAX profiler span; writes a trace when ``STRUGATZKI_PROFILE`` is set
    to a directory path, otherwise a no-op."""
    out = os.environ.get("STRUGATZKI_PROFILE")
    if not out:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(out, name)):
        yield
