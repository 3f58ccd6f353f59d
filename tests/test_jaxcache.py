"""Persistent XLA compilation cache (utils/jaxcache.py).

Cold-start is where the batched-kernel design pays its one cost over
the reference's compile-nothing Python loop (BASELINE.md end-to-end
table: 200-290 s of XLA compile per trigger-pipeline config on the dev
tunnel). These tests pin the enable() contract and prove executables
written by one process are HIT (not recompiled) by the next.
"""

import json
import os
import subprocess
import sys

import jax
import pytest

from detprocess_tpu.utils import jaxcache


@pytest.fixture(autouse=True)
def _reset_state():
    prev = getattr(jax.config, "jax_compilation_cache_dir", None)
    jaxcache._state.update(resolved=False, path=None)
    yield
    jaxcache._state.update(resolved=False, path=None)
    jax.config.update("jax_compilation_cache_dir", prev)


def test_enable_sets_config_and_is_idempotent(tmp_path, monkeypatch):
    cachedir = str(tmp_path / "xla")
    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE_DIR", cachedir)
    assert jaxcache.enable() == cachedir
    assert jax.config.jax_compilation_cache_dir == cachedir
    assert os.path.isdir(cachedir)
    assert jaxcache.enable() == cachedir          # resolved: no re-work


def test_env_opt_out(monkeypatch):
    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE", "0")
    assert jaxcache.enable() is None
    assert not getattr(jax.config, "jax_compilation_cache_dir", None)


def test_existing_user_config_respected(tmp_path, monkeypatch):
    user_dir = str(tmp_path / "user_cache")
    jax.config.update("jax_compilation_cache_dir", user_dir)
    monkeypatch.setenv("DETPROC_TPU_COMPILE_CACHE_DIR",
                       str(tmp_path / "ours"))
    assert jaxcache.enable() == user_dir
    assert jax.config.jax_compilation_cache_dir == user_dir


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
    assert jax.config.jax_compilation_cache_dir == cachedir


_CHILD = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from detprocess_tpu.utils import jaxcache
assert jaxcache.enable() == os.environ["DETPROC_TPU_COMPILE_CACHE_DIR"]
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
               JAX_PLATFORMS="cpu")
    for k in ("XLA_FLAGS",):
        env.pop(k, None)

    def run():
        r = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr
        return sorted(os.listdir(cachedir))

    entries1 = run()
    assert entries1, "first process wrote no cache entries"
    entries2 = run()
    assert entries2 == entries1, (
        "second process recompiled (new cache entries) instead of "
        "hitting the persistent cache")
