"""JAX platform/runtime configuration.

Called once on first import of any compute module:

* ``STRUGATZKI_PLATFORM`` (e.g. ``cpu``, ``tpu``, ``axon``) overrides the JAX
  platform via ``jax.config`` — necessary because environment sitecustomize
  hooks may force a backend through ``jax.config`` after ``JAX_PLATFORMS``
  has been read.
* A persistent compilation cache (``STRUGATZKI_COMPILE_CACHE``, default
  ``~/.cache/strugatzki_tpu/jax``) so CLI invocations don't pay the 20-40s
  first TPU compile every run.
"""

from __future__ import annotations

import os

_configured = False


def configure() -> None:
    global _configured
    if _configured:
        return
    _configured = True

    import jax

    plat = os.environ.get("STRUGATZKI_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception as e:
            # never silently lose the documented escape hatch — a backend
            # initialized before this import cannot be switched anymore
            import warnings
            warnings.warn(f"STRUGATZKI_PLATFORM={plat!r} could not be "
                          f"applied ({e!r}); the already-initialized JAX "
                          f"backend stays active", RuntimeWarning)

    cache_dir = os.environ.get(
        "STRUGATZKI_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "strugatzki_tpu", "jax"))
    if cache_dir and cache_dir != "0":
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:
            pass
