"""Benchmark: of1x1 optimal-filter feature extraction events/sec on one chip.

BASELINE.json config 1: of1x1 (nodelay + unconstrained delay scan) +
baseline/integral on synthetic 32768-sample TES pulse batches. The
baseline is the reference's processing model — a single-CPU-core per-event
Python loop over the same float64 numpy math (tests/reference_impl.py,
standing in for detprocess+QETpy, which run exactly such a loop:
detprocess/process/features.py:533-851).

Structure (round 4 — a benchmark that can exceed the driver budget on a
flaky tunnel is a benchmark that doesn't exist; BENCH_r03 was rc=124):

- The PARENT process is a pure orchestrator: it never imports jax, so
  nothing in it can hang on a dead TPU tunnel.
- One bounded device probe (single try, 45 s subprocess timeout — no
  retry sleeps; round 3's 3x150 s probes + 2x60 s sleeps burned 570 s
  before the benchmark started).
- The timed device leg runs in a SUBPROCESS under its own hard timeout:
  a tunnel that dies after the probe kills the leg, not the driver
  (the in-process round-3 design blocked forever in np.asarray).
- A JSON line is ALWAYS printed from whichever leg completed: device,
  else a clearly-flagged CPU run.
- A global deadline (DETPROC_BENCH_DEADLINE, default 540 s) sizes the
  leg timeouts so the worst case fits the driver budget.

Measurement notes:
- Test traces are synthesized ON DEVICE (jax.random): this session's TPU
  is reached through a tunnel whose host↔device link runs at ~20 MB/s,
  which would otherwise dominate; on-device staging reflects the real
  pipeline design (io feeds batches asynchronously).
- Batches are PIPELINED (several dispatches in flight, one sync at the
  end) — the tunnel adds ~30 ms round-trip latency per synchronous call,
  which production batch processing does not pay per batch.

Prints ONE JSON line:
    {"metric": ..., "value": events_per_sec, "unit": "events/s",
     "vs_baseline": speedup_vs_single_cpu_core}
"""

import json
import os
import subprocess
import sys
import time

FS = 1.25e6
N = 32768
PRETRIG = N // 2
BATCH = 8192
NBATCH = 8
CPU_BASELINE_EVENTS = 24

_START = time.monotonic()
DEADLINE = float(os.environ.get("DETPROC_BENCH_DEADLINE", "540"))


def _remaining():
    return DEADLINE - (time.monotonic() - _START)


# --------------------------------------------------------------------------
# benchmark legs (run inside a subprocess: `python bench.py --leg tpu|cpu`)
# --------------------------------------------------------------------------

def build_bank():
    import numpy as np

    from detprocess_tpu.models import pulse
    from detprocess_tpu.ops import filterbank

    template = pulse.make_template(FS, N, PRETRIG, A=1.0, tau_r=20e-6,
                                   tau_f1=200e-6)
    f = np.abs(np.fft.fftfreq(N, 1 / FS))
    f[0] = f[1]
    psd = 1e-20 * (1.0 + 100.0 / f)
    bank = filterbank.make_of1x1_bank(template, psd, FS, PRETRIG)
    return template, psd, bank


def bench_tpu(bank, template):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from detprocess_tpu.ops import fft as dfft
    from detprocess_tpu.ops import filterbank, of1x1, tracestats

    # same layout dispatch as the feature plan (pipelines/features.py):
    # the packed Z-domain chain when the four-step FFT engages
    # (BASELINE.md "Packed of1x1 chain" — the measured-fastest layout),
    # natural half-spectrum otherwise.
    packed = dfft.site_packed(N, "feature")
    hperm = None if packed else dfft.site_half_perm_indices(N, "feature")
    host_bank = bank.to_device(np.float32)
    if hperm is not None:
        host_bank = filterbank.permute_half_bank(host_bank, hperm)
    dev_bank = jax.tree.map(jnp.asarray, host_bank)
    if packed:
        dev_bank = dict(dev_bank)
        dev_bank["pk"] = jax.tree.map(
            jnp.asarray, filterbank.packed_half_coeffs(bank, np.float32))
    spec_k = None if hperm is None else jnp.asarray(hperm)
    tmpl_dev = jnp.asarray(template, jnp.float32)

    # two-sided PSD at rfft bins, for PSD-matched noise synthesis:
    # E|ñ_k|² = N·fs·J_k (numpy unnormalized-FFT convention, matching
    # denom_inv = 1/(N·fs·J) in the bank) → χ²/dof ~ 1 by construction
    psd_half = jnp.asarray(bank.psd[0][:N // 2 + 1], jnp.float32)
    half_scale = jnp.sqrt(psd_half * FS * N / 2.0)

    @jax.jit
    def make_batch(key):
        """Synthesize a batch on device: PSD-matched colored noise +
        random-amplitude pulses at the template position (t0 = 0)."""
        knoise, kamp = jax.random.split(key)
        z = jax.random.normal(knoise, (BATCH, 2, N // 2 + 1),
                              jnp.float32)
        nf = (z[:, 0] + 1j * z[:, 1]) * half_scale
        nf = nf.at[:, 0].set(0.0)                       # DC (notched)
        nf = nf.at[:, -1].set(z[:, 0, -1]               # real Nyquist
                              * half_scale[-1] * jnp.sqrt(2.0))
        noise = jnp.fft.irfft(nf, n=N)
        amps = jax.random.uniform(kamp, (BATCH,), jnp.float32,
                                  1e-6, 5e-6)
        return noise + amps[:, None] * tmpl_dev[None, :], amps

    @jax.jit
    def feature_step(traces, dev):
        bh = filterbank.device_bank_1x1_half(dev)
        if packed:
            pk = of1x1.device_packed_1x1(dev["pk"])
            z, zr = dfft.packed_spectrum(traces[:, None, :])
            wd = of1x1.of1x1_withdelay_packed(z, zr, pk, PRETRIG, FS, N)
            nod = of1x1.of1x1_nodelay_packed(z, zr, pk, N)
        elif hperm is not None:
            vr = of1x1.signal_rfft_perm(traces[:, None, :])
            wd = of1x1.of1x1_withdelay_half_perm(
                vr, bh.phi, bh.norm, bh.denom_inv, bh.s_fft, bh.bin_w,
                PRETRIG, FS, N, spec_k)
            nod = of1x1.of1x1_nodelay_half(vr, bh.phi, bh.norm,
                                           bh.denom_inv, bh.s_fft,
                                           bh.bin_w, n=N, spec_k=spec_k)
        else:
            vr = of1x1.signal_rfft(traces[:, None, :])
            wd = of1x1.of1x1_withdelay_half(vr, bh.phi, bh.norm,
                                            bh.denom_inv, bh.s_fft,
                                            bh.bin_w, PRETRIG, FS)
            nod = of1x1.of1x1_nodelay_half(vr, bh.phi, bh.norm,
                                           bh.denom_inv, bh.s_fft,
                                           bh.bin_w, n=N)
        return (nod.amp[:, 0], nod.chi2[:, 0], wd.amp[:, 0], wd.t0[:, 0],
                wd.chi2[:, 0], tracestats.baseline(traces),
                tracestats.integral(traces, FS))

    keys = jax.random.split(jax.random.PRNGKey(0), NBATCH)
    batches = [make_batch(k) for k in keys]
    # compile + warm up (block via host transfer so compile cost and any
    # deferred backend errors surface before timing)
    out = feature_step(batches[0][0], dev_bank)
    np.asarray(out[2])

    t0 = time.perf_counter()
    outs = [feature_step(tr, dev_bank) for tr, _ in batches]
    # sync with ONE device→host transfer of the last output: the stream
    # is FIFO so its availability implies all batches completed. (Do NOT
    # use jax.block_until_ready here — on this backend it returns before
    # queued computation finishes; and do not transfer every output —
    # that pays one ~30 ms tunnel round-trip per batch.)
    np.asarray(outs[-1][2]).ravel()[:1]
    dt = time.perf_counter() - t0
    events_per_sec = BATCH * NBATCH / dt
    amps_rec = [np.asarray(o[2]) for o in outs]   # post-timing readback

    # correctness: recovered amplitudes match the injected ones to
    # within the matched-filter resolution
    sigma_amp = float(bank.resolution[0])        # 1/sqrt(norm)
    amps_true = np.asarray(batches[0][1])
    err = np.abs(amps_rec[0] - amps_true)
    if not np.all(err < max(1e-7, 8 * sigma_amp)):
        raise RuntimeError(f"benchmark correctness check failed: "
                           f"max amp error {err.max():.3e} "
                           f"(sigma_amp {sigma_amp:.3e})")

    # physics invariants on the SAME device outputs (VERDICT r4 item 4:
    # the driver artifact carries correctness, not just throughput).
    # Known-truth injections: amps_true per event, t0_true = 0 (pulses
    # sit at the template position), and make_batch synthesizes noise
    # MATCHED to the bank's PSD (E|ñ_k|² = N·fs·J_k) → χ²/dof ~ 1 by
    # construction. Reference anchor for the invariant set:
    # detprocess/process/features.py:533-851 (OF feature columns).
    truths = [np.asarray(b[1]) for b in batches]
    rel = np.concatenate([(r - t) / t
                          for r, t in zip(amps_rec, truths)])
    scatter_sigma = float(np.std(
        np.concatenate([r - t for r, t in zip(amps_rec, truths)]))
        / sigma_amp)
    chi2 = np.concatenate([np.asarray(o[4]) for o in outs])
    chi2_dof = float(np.mean(chi2) / (N - 2))
    t0s = np.concatenate([np.asarray(o[3]) for o in outs])
    t0_within_1 = float(np.mean(np.abs(t0s) * FS <= 1.0))
    physics = {
        "amp_bias": round(float(np.mean(rel)), 6),
        "amp_scatter_sigma": round(scatter_sigma, 4),
        "chi2_dof": round(chi2_dof, 5),
        "t0_within_1": round(t0_within_1, 5),
        "pass": bool(abs(float(np.mean(rel))) < 5e-3
                     and abs(chi2_dof - 1.0) < 0.05
                     and t0_within_1 > 0.99),
    }
    return events_per_sec, physics


def bench_cpu_baseline(template, psd):
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    from reference_impl import RefOF1x1

    rng = np.random.default_rng(0)
    ref = RefOF1x1(template, psd, FS, PRETRIG)
    sub = (rng.standard_normal((CPU_BASELINE_EVENTS, N)) * 3e-9
           + 2e-6 * template[None, :])
    # pinned core (round-3 CPU protocol — see benchmarks/run_all.py)
    try:
        os.sched_setaffinity(0, {0})
    except (AttributeError, OSError):
        pass
    # best of 3 passes: the fastest CPU run gives the most conservative
    # speedup (the host is shared, single runs swing with contention)
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(len(sub)):
            ref.fit_nodelay(sub[i])
            ref.fit_withdelay(sub[i])
            np.mean(sub[i][: N - 1])
            np.trapezoid(sub[i][: N - 1]) / FS
        best_dt = min(best_dt, time.perf_counter() - t0)
    return len(sub) / best_dt


def run_leg(kind):
    """Run one benchmark leg in THIS process and print the JSON line."""
    global BATCH, NBATCH
    if kind == "cpu":
        # must land before any backend initialization: the preinstalled
        # TPU plugin can override JAX_PLATFORMS (see tests/conftest.py),
        # and its init hangs forever when the tunnel is dead.
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        BATCH, NBATCH = 256, 2
    # persistent compile cache: a leg that times out still warms the
    # cache for the retry / the next round's run
    try:
        from detprocess_tpu.utils import jaxcache
        jaxcache.enable()
    except Exception:
        pass
    template, psd, bank = build_bank()
    events_per_sec, physics = bench_tpu(bank, template)
    cpu_rate = bench_cpu_baseline(template, psd)
    result = {
        "metric": "of1x1 feature extraction (32k samples, nodelay+delay-scan"
                  "+trace stats)",
        "value": round(events_per_sec, 1),
        "unit": "events/s",
        "vs_baseline": round(events_per_sec / cpu_rate, 1),
        "physics": physics,
    }
    if kind == "cpu":
        result["platform"] = "cpu"
    print(json.dumps(result), flush=True)


# --------------------------------------------------------------------------
# orchestrator (parent process — never imports jax)
# --------------------------------------------------------------------------

def probe_device(timeout=None, tries=None):
    """True when the accelerator answers a tiny compute+transfer probe.

    A dead TPU tunnel makes ``jax.devices()`` hang forever with no error
    (observed round 3), so the probe runs in a SUBPROCESS under a hard
    timeout. NO sleeps between tries (round 3's 570 s of probe sleeps
    blew the driver budget); a down tunnel falls through to the flagged
    CPU leg. Healthy-tunnel init measures 30-100 s on this dev setup,
    hence the 100 s default per try.
    """
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        return False
    timeout = float(timeout if timeout is not None else os.environ.get(
        "DETPROC_BENCH_PROBE_TIMEOUT", "100"))
    tries = int(tries if tries is not None else os.environ.get(
        "DETPROC_BENCH_PROBE_TRIES", "2"))
    code = ("import jax, numpy as np, jax.numpy as jnp\n"
            "x = jnp.asarray(np.ones(8, np.float32))\n"
            "print('PROBE_OK', float(np.asarray(x.sum())))\n")
    for _ in range(max(tries, 1)):
        t = min(timeout, max(_remaining() - 150.0, 5.0))
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=t)
            if r.returncode == 0 and b"PROBE_OK 8.0" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if _remaining() < 260.0:   # keep room for the CPU leg
            return False
    return False


def _run_leg_subprocess(kind, timeout):
    """Run `python bench.py --leg {kind}` under a hard timeout; return
    the parsed JSON result or None."""
    env = dict(os.environ)
    if kind == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", kind],
            capture_output=True, text=True, timeout=timeout, env=env)
    except subprocess.TimeoutExpired:
        print(f"# {kind} leg timed out after {timeout:.0f}s",
              file=sys.stderr)
        return None
    if r.returncode != 0:
        print(f"# {kind} leg failed rc={r.returncode}: "
              f"{(r.stderr or '')[-500:]}", file=sys.stderr)
        return None
    for line in reversed((r.stdout or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
                if "value" in parsed:
                    return parsed
            except json.JSONDecodeError:
                continue
    print(f"# {kind} leg printed no JSON", file=sys.stderr)
    return None


def main():
    forced_cpu = os.environ.get("JAX_PLATFORMS", "").lower() == "cpu"
    result = None
    tried_device = False
    if not forced_cpu and probe_device():
        tried_device = True
        # leave budget for a CPU fallback leg (~120 s incl. imports)
        timeout = max(min(_remaining() - 130.0, 390.0), 30.0)
        result = _run_leg_subprocess("tpu", timeout)
    if result is None:
        cpu_result = _run_leg_subprocess(
            "cpu", max(_remaining() - 5.0, 30.0))
        if cpu_result is not None:
            result = cpu_result
            if forced_cpu:
                result["platform"] = "cpu (JAX_PLATFORMS=cpu set by caller)"
            elif tried_device:
                result["platform"] = (
                    "cpu-fallback: device leg failed/timed out after a "
                    "successful probe; see BASELINE.md for on-chip numbers")
            else:
                result["platform"] = (
                    "cpu-fallback: TPU tunnel unreachable at bench time "
                    "(probe timed out); see BASELINE.md for on-chip "
                    "numbers")
    if result is None:
        # every leg failed — still emit a parseable line (value 0 beats
        # a hung or silent driver run)
        result = {"metric": "of1x1 feature extraction (32k samples, "
                            "nodelay+delay-scan+trace stats)",
                  "value": 0, "unit": "events/s", "vs_baseline": 0,
                  "platform": "error: all benchmark legs failed"}
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--leg":
        run_leg(sys.argv[2])
    else:
        main()
