"""Persistent XLA compilation cache.

Every executable compiled for the tunneled TPU pays minutes of remote-compile
latency (a cold full-budget registration spends ~145 s compiling its three
pyramid stages; the reference has no analogous cost — CUDA kernels ship
precompiled). The JAX persistent cache keys serialized executables by HLO, so
a second process at the same intrinsics starts warm. Enabled automatically by
the CLI; opt out with ``XVR_NO_COMPILE_CACHE=1`` or point ``XVR_COMPILE_CACHE``
at a different directory.
"""

from __future__ import annotations

import os
from pathlib import Path

# Persist anything that took >= 1 s to compile. jax's 5 s default leaves the
# coarse pyramid stages (~4 s compiles) unwritten, so every fresh process
# recompiles them through the tunnel; sub-second op-by-op dispatches stay
# unpersisted to keep the cache from filling with trivia.
_MIN_COMPILE_SECS = 1.0


def enable_compilation_cache() -> Path | None:
    """Turn on JAX's on-disk compilation cache. Returns the cache dir, or
    None when disabled (env opt-out or an unwritable location)."""
    if os.environ.get("XVR_NO_COMPILE_CACHE"):
        return None
    cachedir = Path(
        os.environ.get("XVR_COMPILE_CACHE", "~/.cache/xvr_tpu/jax")
    ).expanduser()
    try:
        cachedir.mkdir(parents=True, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", str(cachedir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", _MIN_COMPILE_SECS)
        try:
            # one WARNING line naming the first-differing cache-key field on
            # every persistent-cache miss: cross-process misses on supposedly
            # deterministic HLO (stage executables) are bugs, and this is the
            # only way to see WHY a key changed
            jax.config.update("jax_explain_cache_misses", True)
        except AttributeError:
            pass
    except (OSError, AttributeError):  # read-only FS or an older jax
        return None
    return cachedir
