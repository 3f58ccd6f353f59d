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

The cache directory is **fingerprinted by execution context**: the
configured base directory gains a ``{platform}-{hash}`` subdirectory
where the hash covers the jax version, the platform, and the host CPU
feature set. XLA:CPU persists ahead-of-time executables compiled for
the *build* host's CPU features; loading one on a host without those
features is a SIGILL hazard (observed as ``cpu_aot_loader.cc`` errors
when one shared directory served two machine contexts). Distinct
fingerprints can never share entries.

On the **CPU backend the cache is off by default**: XLA:CPU persists
ahead-of-time executables whose embedded machine spec includes
compiler-tuning pseudo-features (``+prefer-no-scatter``,
``+prefer-no-gather``) that the load-time host-feature probe never
reports, so every reload — even on the machine that compiled it —
logs ``cpu_aot_loader.cc`` feature-mismatch errors. The CPU cold
start is seconds (vs 200-290 s on the tunnel TPU), so the safe
default is to recompile; ``DETPROC_TPU_COMPILE_CACHE=1`` opts in.

Environment knobs:

- ``DETPROC_TPU_COMPILE_CACHE`` — ``auto`` (default: enabled except
  on the CPU backend), ``1``/``force`` (always), ``0`` (never)
- ``DETPROC_TPU_COMPILE_CACHE_DIR`` — base cache location (default
  ``~/.cache/detprocess_tpu/xla``); the fingerprint subdir is appended.

A user who already set ``jax_compilation_cache_dir`` (config or
``JAX_COMPILATION_CACHE_DIR``) keeps their setting — :func:`enable`
never overrides an explicit choice. It distinguishes the user's value
from one *it* wrote earlier (ownership is recorded), so repeated
enable() calls in one process re-resolve correctly instead of
mistaking their own previous setting for the user's. Backends whose
executables cannot be serialized are handled by JAX itself (it logs
and skips caching); enabling is always safe.
"""

from __future__ import annotations

import contextlib
import hashlib
import os
import platform as _platform
import threading
from typing import Optional

# "owned" records the config value enable() itself wrote, so a later
# call can tell a user's explicit setting (respected) from its own
# previous one (re-resolved). Survives test-level resets of
# resolved/path by design.
_state = {"resolved": False, "path": None, "owned": None}
_lock = threading.Lock()


def _platform_pin() -> str:
    """The effective platform WITHOUT initializing a backend (backend
    init hangs forever on a dead TPU tunnel — bench.py probe notes):
    an already-initialized backend is used if present, else the
    configured ``jax_platforms`` / ``JAX_PLATFORMS`` pin, else
    ``"auto"``."""
    import jax

    try:  # use the backend only if something else already built it
        from jax._src import xla_bridge
        if getattr(xla_bridge, "_backends", None):
            return jax.default_backend()
    except Exception:
        pass
    pin = (getattr(jax.config, "jax_platforms", None)
           or os.environ.get("JAX_PLATFORMS", "") or "")
    pin = pin.split(",")[0].strip().lower()
    if pin:
        return pin
    # no pin, no backend yet: inspect the registered backend FACTORIES
    # (registration is cheap and already done at import; only
    # initialization can hang). jax registers the 'tpu' factory
    # UNCONDITIONALLY (it fails quietly at init when libtpu is absent),
    # so its mere presence says nothing — a host with no libtpu and no
    # other accelerator factory will resolve to the cpu backend; report
    # "cpu" so the auto-mode cache skip applies there too (plain
    # CPU-only installs must not hit the cpu_aot_loader reload noise).
    try:
        from jax._src import xla_bridge
        factories = set(getattr(xla_bridge, "_backend_factories", {}))
        extra = factories - {"cpu", "interpreter"} if factories else None
        if extra is not None:
            if not extra:
                return "cpu"
            if extra == {"tpu"}:
                import importlib.util
                if importlib.util.find_spec("libtpu") is None:
                    return "cpu"
    except Exception:
        pass
    return "auto"


def fingerprint() -> str:
    """Execution-context fingerprint: ``{platform}-{hash10}``.

    The hash covers the jax version, the platform, and the host CPU
    feature flags (``/proc/cpuinfo``), so CPU-AOT executables from one
    machine context can never be offered to another.
    """
    import jax

    plat = _platform_pin()
    feats = _platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line.strip()
                    break
    except OSError:
        pass
    h = hashlib.sha1(
        f"{jax.__version__}|{plat}|{feats}".encode()).hexdigest()[:10]
    return f"{plat}-{h}"


def enable(path: Optional[str] = None) -> Optional[str]:
    """Idempotently enable the persistent compilation cache.

    Returns the cache directory in use (base + fingerprint subdir),
    or None when disabled (env opt-out, unwritable directory, or a JAX
    too old to support it). Thread-safe.
    """
    with _lock:
        return _enable_locked(path)


def _enable_locked(path: Optional[str]) -> Optional[str]:
    if _state["resolved"] and path is None:
        return _state["path"]
    import jax

    current = getattr(jax.config, "jax_compilation_cache_dir", None)
    user_set = bool(current) and current != _state["owned"]
    knob = os.environ.get("DETPROC_TPU_COMPILE_CACHE", "auto").lower()
    if knob in ("0", "false", "off", "no"):
        if current and not user_set:
            # undo our own earlier setting; never touch the user's
            jax.config.update("jax_compilation_cache_dir", None)
            _state["owned"] = None
        _state.update(resolved=True, path=None)
        return None
    if user_set:
        # user already configured a cache — respect it
        _state.update(resolved=True, path=current)
        return current
    if knob not in ("1", "true", "on", "yes", "force") and \
            _platform_pin() == "cpu":
        # auto: skip the cache on the CPU backend — persisted XLA:CPU
        # AOT executables log cpu_aot_loader feature-mismatch errors on
        # EVERY reload (compiler-tuning pseudo-features the host probe
        # never reports), and CPU cold start is seconds anyway.
        if current:                      # our own earlier setting
            jax.config.update("jax_compilation_cache_dir", None)
            _state["owned"] = None
        _state.update(resolved=True, path=None)
        return None
    if path is None:
        path = os.environ.get("DETPROC_TPU_COMPILE_CACHE_DIR") or \
            os.path.join(os.path.expanduser("~"), ".cache",
                         "detprocess_tpu", "xla")
    full = os.path.join(path, fingerprint())
    try:
        os.makedirs(full, exist_ok=True)
        # pid+thread-unique probe name: concurrent enable() calls from
        # sibling processes must not race create/remove on one file
        probe = os.path.join(
            full, f".write_probe.{os.getpid()}.{threading.get_ident()}")
        with open(probe, "w"):
            pass
        with contextlib.suppress(FileNotFoundError):
            os.remove(probe)
        jax.config.update("jax_compilation_cache_dir", full)
    except Exception as exc:  # unwritable dir / ancient jax: run uncached
        print(f"WARNING: persistent compilation cache disabled ({exc})")
        _state.update(resolved=True, path=None)
        return None
    _state.update(resolved=True, path=full, owned=full)
    return full
