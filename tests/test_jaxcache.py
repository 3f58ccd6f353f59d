"""Persistent XLA compilation cache (utils/jaxcache.py).

Cold-start is where the batched-kernel design pays its one cost over
the reference's compile-nothing Python loop (BASELINE.md end-to-end
table: 200-290 s of XLA compile per trigger-pipeline config on the dev
tunnel). These tests pin the enable() contract — including its
ownership semantics (a value enable() wrote earlier is re-resolved,
only a USER's value is deferred to) and the machine-context
fingerprinting that keeps CPU-AOT executables from crossing hosts —
and prove executables written by one process are HIT (not recompiled)
by the next.
"""

import os
import subprocess
import sys

import jax
import pytest

from detprocess_tpu.utils import jaxcache


@pytest.fixture(autouse=True)
def _reset_state(monkeypatch):
    prev = getattr(jax.config, "jax_compilation_cache_dir", None)
    prev_owned = jaxcache._state["owned"]
    jaxcache._state.update(resolved=False, path=None)
    # the suite runs on the CPU backend, where auto mode disables the
    # cache (cpu_aot_loader reload noise) — force-enable so the enable
    # machinery is exercised; auto behavior has its own test below
    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE", "1")
    yield
    jaxcache._state.update(resolved=False, path=None, owned=prev_owned)
    jax.config.update("jax_compilation_cache_dir", prev)


def test_enable_sets_config_and_is_idempotent(tmp_path, monkeypatch):
    cachedir = str(tmp_path / "xla")
    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE_DIR", cachedir)
    got = jaxcache.enable()
    # fingerprint subdir under the configured base
    assert got == os.path.join(cachedir, jaxcache.fingerprint())
    assert jax.config.jax_compilation_cache_dir == got
    assert os.path.isdir(got)
    assert jaxcache.enable() == got               # resolved: no re-work


def test_env_opt_out(monkeypatch):
    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE", "0")
    assert jaxcache.enable() is None
    assert not getattr(jax.config, "jax_compilation_cache_dir", None)


def test_auto_mode_skips_cpu_backend(tmp_path, monkeypatch):
    """Default (auto) mode must not persist XLA:CPU AOT executables —
    every reload logs cpu_aot_loader feature-mismatch errors (the
    MULTICHIP_r03 wall), even on the machine that compiled them."""
    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE", "auto")
    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE_DIR",
                       str(tmp_path / "xla"))
    # suite runs with the cpu platform pinned (conftest)
    assert jaxcache._platform_pin() == "cpu"
    assert jaxcache.enable() is None
    assert not getattr(jax.config, "jax_compilation_cache_dir", None)
    # a user's explicit config still wins over the auto skip
    user_dir = str(tmp_path / "user")
    jax.config.update("jax_compilation_cache_dir", user_dir)
    jaxcache._state.update(resolved=False, path=None)
    assert jaxcache.enable() == user_dir


def test_ownership_not_confused_by_own_setting(tmp_path, monkeypatch):
    """A value enable() itself wrote earlier must be re-resolved, not
    mistaken for a user setting (the round-3 order-dependence bug:
    any earlier pipeline test's enable() left config set, and a later
    enable() 'respected' its own stale value)."""
    first = str(tmp_path / "first")
    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE_DIR", first)
    got1 = jaxcache.enable()
    assert got1.startswith(first)
    # simulate a fresh resolution cycle (new test/module) with a NEW env
    # dir while jax config still holds OUR old value
    jaxcache._state.update(resolved=False, path=None)
    second = str(tmp_path / "second")
    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE_DIR", second)
    got2 = jaxcache.enable()
    assert got2.startswith(second), (
        "enable() deferred to its own previous setting")
    assert jax.config.jax_compilation_cache_dir == got2


def test_opt_out_undoes_own_setting_only(tmp_path, monkeypatch):
    """Opt-out clears a dir enable() wrote, but never a user's."""
    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE_DIR",
                       str(tmp_path / "ours"))
    assert jaxcache.enable() is not None
    jaxcache._state.update(resolved=False, path=None)
    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE", "0")
    assert jaxcache.enable() is None
    assert not getattr(jax.config, "jax_compilation_cache_dir", None)
    # user value survives opt-out
    user_dir = str(tmp_path / "user")
    jax.config.update("jax_compilation_cache_dir", user_dir)
    jaxcache._state.update(resolved=False, path=None)
    assert jaxcache.enable() is None
    assert jax.config.jax_compilation_cache_dir == user_dir


def test_existing_user_config_respected(tmp_path, monkeypatch):
    user_dir = str(tmp_path / "user_cache")
    jax.config.update("jax_compilation_cache_dir", user_dir)
    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE_DIR",
                       str(tmp_path / "ours"))
    assert jaxcache.enable() == user_dir
    assert jax.config.jax_compilation_cache_dir == user_dir


def test_fingerprints_never_share_entries(tmp_path, monkeypatch):
    """Two different machine/platform contexts resolve to different
    subdirectories of the same base — entries cannot cross contexts
    (the MULTICHIP_r03 cpu_aot_loader SIGILL hazard)."""
    base = str(tmp_path / "xla")
    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE_DIR", base)
    monkeypatch.setenv("JAX_PLATFORMS", "")  # fall through to pin logic

    fp_real = jaxcache.fingerprint()
    got = jaxcache.enable()
    assert got == os.path.join(base, fp_real)

    # same base, different platform pin → different fingerprint subdir
    import unittest.mock as mock
    with mock.patch.object(jaxcache, "fingerprint",
                           return_value="otherplat-0123456789"):
        jaxcache._state.update(resolved=False, path=None)
        got2 = jaxcache.enable()
    assert got2 == os.path.join(base, "otherplat-0123456789")
    assert got2 != got
    assert os.path.dirname(got2) == os.path.dirname(got)  # shared base
    # both directories exist and are disjoint
    assert os.path.isdir(got) and os.path.isdir(got2)


def test_fingerprint_covers_cpu_features(monkeypatch):
    """The hash must change when the host CPU feature set changes."""
    fp1 = jaxcache.fingerprint()
    real_open = open

    def fake_open(path, *a, **k):
        if path == "/proc/cpuinfo":
            import io
            return io.StringIO("flags\t\t: fpu vme something_else\n")
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", fake_open)
    fp2 = jaxcache.fingerprint()
    assert fp1.rsplit("-", 1)[0] == fp2.rsplit("-", 1)[0]  # same platform
    assert fp1 != fp2                                      # different hash


def test_enable_thread_safe(tmp_path, monkeypatch):
    """Concurrent enable() calls agree and none spuriously disables
    (the ADVICE probe-filename race)."""
    import threading

    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE_DIR",
                       str(tmp_path / "xla"))
    results = []

    def worker():
        results.append(jaxcache.enable())

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(set(results)) == 1 and results[0] is not None


def test_pipeline_constructor_enables(tmp_path, monkeypatch):
    """TriggerProcessing.__init__ turns the cache on (the user-facing
    path: construct a pipeline, get cached cold starts)."""
    import numpy as np

    from detprocess_tpu.io.filterfile import FilterData
    from detprocess_tpu.io.rawdata import RawWriter
    from detprocess_tpu.models import pulse
    from detprocess_tpu.pipelines.triggers import TriggerProcessing
    import yaml

    cachedir = str(tmp_path / "xla")
    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE_DIR", cachedir)
    fs, nt, pre = 1.25e6, 256, 64
    tmpl = pulse.make_template(fs, nt, pre, A=1.0, tau_r=20e-6,
                               tau_f1=200e-6)
    w = RawWriter(str(tmp_path / "raw"), "I1_D20260820_T110000", fs,
                  ["chan1"], data_type="continuous")
    w.write_dump(np.zeros((1, 1, 4096)), dump_num=1)
    fd = FilterData(verbose=False)
    fd.set_template("chan1", tmpl, fs, pretrigger_length_samples=pre)
    fd.set_psd("chan1", np.full(nt, 1e-18), fs)
    cfg = {"trigger": {"chan1": {"run": True, "template_tag": "default",
                                 "threshold_sigma": 8.0}}}
    cpath = str(tmp_path / "t.yaml")
    yaml.safe_dump(cfg, open(cpath, "w"))
    TriggerProcessing(sorted(str(p) for p in
                             (tmp_path / "raw").glob("*.hdf5")),
                      cpath, filter_data=fd, verbose=False)
    got = jax.config.jax_compilation_cache_dir
    assert got == os.path.join(cachedir, jaxcache.fingerprint())


_CHILD = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from detprocess_tpu.utils import jaxcache
got = jaxcache.enable()
base = os.environ["DETPROC_TPU_COMPILE_CACHE_DIR"]
assert got == os.path.join(base, jaxcache.fingerprint()), (got, base)
# force-cache everything regardless of size/compile time
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp, numpy as np
@jax.jit
def f(x):
    return jnp.tanh(x @ x.T).sum()
print(float(np.asarray(f(jnp.ones((64, 64), jnp.float32)))))
"""


def test_cross_process_cache_hit(tmp_path):
    """Process 1 compiles and writes entries; process 2 compiling the
    same function adds NO new entries (= persistent-cache hit, not a
    recompile — a miss would write, since the thresholds force it)."""
    cachedir = str(tmp_path / "xla")
    env = dict(os.environ, DETPROC_TPU_COMPILE_CACHE_DIR=cachedir,
               DETPROC_TPU_COMPILE_CACHE="1", JAX_PLATFORMS="cpu")
    for k in ("XLA_FLAGS",):
        env.pop(k, None)

    def run():
        r = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr
        entries = []
        for root, _dirs, files in os.walk(cachedir):
            entries.extend(os.path.join(os.path.relpath(root, cachedir), f)
                           for f in files)
        return sorted(entries)

    entries1 = run()
    assert entries1, "first process wrote no cache entries"
    entries2 = run()
    assert entries2 == entries1, (
        "second process recompiled (new cache entries) instead of "
        "hitting the persistent cache")
