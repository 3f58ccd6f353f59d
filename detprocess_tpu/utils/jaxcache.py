"""Persistent XLA compilation cache for pipeline runs.

Cold-starting a pipeline pays the full XLA compile of every jitted
kernel: measured 200-290 s for the trigger pipeline on the dev-tunnel
TPU (BASELINE.md "End-to-end files→tables" — production hosts compile
locally and pay less, but still tens of seconds per distinct
(trace-length, capacity, channel-count) configuration). The reference
pays nothing up front because it compiles nothing — so cold-start is
the one place the batched-kernel design is *slower* than the per-event
Python loop it replaces.

JAX ships an on-disk executable cache keyed by HLO fingerprint
(``jax_compilation_cache_dir``): with it enabled, every process after
the first loads compiled kernels from disk, so repeated production runs
(and the common rerun-after-crash / rerun-next-series case, cf. the
dump-level resume in pipelines/features.py) skip compilation entirely.
The pipelines enable it on construction via :func:`enable`.

Environment knobs:

- ``DETPROC_TPU_COMPILE_CACHE=0`` — disable (default: enabled)
- ``DETPROC_TPU_COMPILE_CACHE_DIR`` — cache location (default
  ``~/.cache/detprocess_tpu/xla``)

A user who already set ``jax_compilation_cache_dir`` (config or
``JAX_COMPILATION_CACHE_DIR``) keeps their setting — :func:`enable`
never overrides an explicit choice. Backends whose executables cannot
be serialized are handled by JAX itself (it logs and skips caching);
enabling is always safe.
"""

from __future__ import annotations

import os
from typing import Optional

_state = {"resolved": False, "path": None}


def enable(path: Optional[str] = None) -> Optional[str]:
    """Idempotently enable the persistent compilation cache.

    Returns the cache directory in use, or None when disabled (env
    opt-out, unwritable directory, or a JAX too old to support it).
    """
    if _state["resolved"] and path is None:
        return _state["path"]
    if os.environ.get("DETPROC_TPU_COMPILE_CACHE", "1").lower() in (
            "0", "false", "off", "no"):
        _state.update(resolved=True, path=None)
        return None
    import jax

    current = getattr(jax.config, "jax_compilation_cache_dir", None)
    if current:
        # user already configured a cache — respect it
        _state.update(resolved=True, path=current)
        return current
    if path is None:
        path = os.environ.get("DETPROC_TPU_COMPILE_CACHE_DIR") or \
            os.path.join(os.path.expanduser("~"), ".cache",
                         "detprocess_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
        probe = os.path.join(path, ".write_probe")
        with open(probe, "w"):
            pass
        os.remove(probe)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception as exc:  # unwritable dir / ancient jax: run uncached
        print(f"WARNING: persistent compilation cache disabled ({exc})")
        _state.update(resolved=True, path=None)
        return None
    _state.update(resolved=True, path=path)
    return path
