"""Benchmark harness: prints one JSON line per BASELINE config —
headline (config 4) FIRST, each of the form
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Headline metric (BASELINE.md config 4): bootstrap particle filter on the
nonlinear 1D tracking model — 1,048,576 particles x 32 time steps, the
whole filter (propagation, weighting, ESS, adaptive systematic resampling)
in ONE jitted ``lax.scan``. Unit: particle-steps/s. ``vs_baseline`` is the
ratio to the host-CPU XLA throughput of the identical full-size program
(``benchmarks/baseline_cpu.json``; the reference publishes no numbers:
BASELINE.json published={}).

Tunnel resilience (the round-1 record was a failed 0.0 measurement):
- the relay is pre-warmed with a tiny throwaway executable;
- measurement happens in SMALL CHUNKED dispatches, and the best-so-far
  result is updated after EVERY completed chunk;
- the watchdog emits the best completed measurement (never 0.0 unless
  nothing at all completed) and exits cleanly before the driver's budget;
- transient tunnel errors get one retry after an idle backoff (the tunnel
  recovers after ~1-4 min idle, see CLAUDE.md).

Roofline accounting: the JSON carries ``achieved_bw_frac`` /
``achieved_flops_frac`` — achieved HBM traffic and (VPU) FLOP rates as a
fraction of TPU v5e peaks, from the documented per-particle-step cost
model below.

Round 3 (VERDICT r2 item 3): after the headline line is emitted, the
remaining BASELINE configs run through ``benchmarks/run_all.py``'s
builders under per-config time guards, each printing its own JSON line —
so the driver-captured record covers every config that fits the budget
(priority order: HMM SMC, VI, NUTS, tempered SMC, SMC², SIR). Headline
chunks fold 16 reps into one dispatch (~30 ms tunnel round trip against
~0.7 s of device compute, <5 % dispatch overhead vs ~17 % at the round-2
reps=4).
"""

import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp

METRIC = "particle_filter_nonlinear_tracking_throughput"
DEADLINE_S = 440.0          # driver watchdog fired at 480s in round 1
MEASURE_CUTOFF_S = 390.0    # stop launching new chunks after this
_T0 = time.monotonic()

# --- Per-particle-step cost model (documented, approximate) ---------------
# Arrays are f32 (4 B/elem), N particles per step:
#   propagate: read xs + write xs_new                     -> 8 B
#   threefry-2x32 normal draw (fused, output-only)        -> 4 B, ~120 flop
#   weight logpdf + log-weight accumulate                 -> 12 B, ~15 flop
#   ESS (logsumexp twice over lw)                         -> 8 B, ~10 flop
#   adaptive systematic resample, ~70% firing rate:
#     normalize+cumsum (8B) + counts/scatter+gather (16B) -> ~17 B amortized
BYTES_PER_PSTEP = 49.0
FLOPS_PER_PSTEP = 160.0
V5E_HBM_BYTES_PER_S = 819e9   # TPU v5e HBM bandwidth
V5E_VPU_F32_FLOPS = 3.2e12    # v5e VPU f32 elementwise peak (est.)

_best_lock = threading.Lock()
_best = {
    "metric": METRIC,
    "value": 0.0,
    "unit": "particle-steps/s",
    "vs_baseline": 0.0,
    "note": "no completed measurement (tunnel stalled; see CLAUDE.md)",
}
_printed = threading.Event()


def _emit():
    if _printed.is_set():
        return
    _printed.set()
    with _best_lock:
        print(json.dumps(_best), flush=True)


def _update_best(throughput: float, n_chunks: int, vs_baseline: float):
    with _best_lock:
        if throughput > _best["value"]:
            _best.update(
                value=round(throughput, 1),
                vs_baseline=round(vs_baseline, 3),
                achieved_bw_frac=round(
                    throughput * BYTES_PER_PSTEP / V5E_HBM_BYTES_PER_S, 4
                ),
                achieved_flops_frac=round(
                    throughput * FLOPS_PER_PSTEP / V5E_VPU_F32_FLOPS, 4
                ),
                chunks_completed=n_chunks,
            )
            _best.pop("note", None)


def _arm_watchdog():
    def fire():
        remaining = DEADLINE_S - (time.monotonic() - _T0)
        time.sleep(max(remaining, 1.0))
        _emit()          # no-op if the headline already printed
        os._exit(0)      # hard stop: extra configs must not overrun

    threading.Thread(target=fire, daemon=True).start()


def _elapsed():
    return time.monotonic() - _T0


def build_pf_fused(n_particles: int, n_steps: int,
                   state_dtype=jnp.float32):
    """Fused-kernel variant: RNG + dynamics + logpdf + weight update +
    logsumexp/ESS in one Pallas pass per step (``ops/fused_step.py``);
    resampling unchanged. Same model and adaptive-resampling semantics
    as :func:`build_pf`; the normal stream is in-kernel threefry +
    Box–Muller, so log Z agrees statistically (A/B in BASELINE.md)."""
    from genjax_tpu.inference.pf import fused_particle_filter

    def propagate(x, e):
        return (
            0.5 * x + 25.0 * x / (1.0 + x * x) + jnp.sqrt(10.0) * e
        )

    def loglik(x, y):
        return -0.5 * (y - x * x / 20.0) ** 2 - 0.5 * jnp.log(
            2 * jnp.pi
        )

    pf = fused_particle_filter(
        lambda k: jax.random.normal(k, (n_particles,)),
        propagate, loglik, n_particles, state_dtype=state_dtype,
    )
    ys = jax.random.normal(jax.random.key(9), (n_steps,)) * 5.0

    def run(key):
        final, _ = pf(key, ys)
        return final.log_z

    return run, n_particles * n_steps


def build_pf(n_particles: int, n_steps: int, state_dtype=jnp.float32):
    from genjax_tpu.inference.pf import particle_filter

    # Batched (array-level) model: one key per step, whole-ensemble ops —
    # the fast path (per-particle fold_in keys cost ~2x at 1M particles).
    # ``state_dtype=jnp.bfloat16`` keeps the particle STATE in bf16
    # (halves resample/propagate HBM traffic); log-weights and the
    # dynamics accumulation stay f32 for logsumexp/cancellation safety
    # (ROADMAP bf16 item; A/B in benchmarks/tpu_micro.py exp_bf16).
    def init(key):
        return (
            jax.random.normal(key, (n_particles,)).astype(state_dtype),
            jnp.zeros((n_particles,)),
        )

    def step(key, xs, y):
        xf = xs.astype(jnp.float32)
        xs_new = (
            0.5 * xf
            + 25.0 * xf / (1.0 + xf * xf)
            + jnp.sqrt(10.0) * jax.random.normal(key, (n_particles,))
        )
        lw = jax.scipy.stats.norm.logpdf(y, xs_new * xs_new / 20.0, 1.0)
        return xs_new.astype(state_dtype), lw

    pf = particle_filter(init, step, n_particles, batched=True)
    ys = jax.random.normal(jax.random.key(9), (n_steps,)) * 5.0

    def run(key):
        final, _ = pf(key, ys)
        return final.log_z

    return run, n_particles * n_steps


def _load_baselines() -> dict:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "baseline_cpu.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _load_cpu_baseline() -> float | None:
    v = _load_baselines().get(METRIC)
    return float(v) if v else None


#: Config order after the headline: throughput-bound configs first (they
#: are the strongest vs-CPU signals and compile fastest), then the
#: MXU-bound trio (8: logreg NUTS, 9: BNN VI, 10: SVGD — longer
#: compiles, highest utilization), then the latency-bound ones. Config 4
#: is the headline.
_EXTRA_CONFIGS = (3, 5, 8, 9, 10, 2, 6, 7, 1)
_EXTRA_MIN_REMAINING_S = 70.0


def _run_extra_configs(on_tpu: bool) -> None:
    """Run the non-headline BASELINE configs, one JSON line each, under
    the global deadline (the watchdog hard-exits at DEADLINE_S)."""
    if not on_tpu:
        return
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks.run_all import CONFIGS

    baselines = _load_baselines()
    for c in _EXTRA_CONFIGS:
        remaining = DEADLINE_S - _elapsed()
        if remaining < _EXTRA_MIN_REMAINING_S:
            print(f"# skipping config {c}: {remaining:.0f}s left",
                  file=sys.stderr)
            break
        try:
            r = CONFIGS[c](False)
        except Exception as e:
            print(f"# config {c} failed: {e!r}", file=sys.stderr)
            continue
        base = baselines.get(r["metric"])
        if base:
            r["vs_baseline"] = round(r["value"] / base, 3)
        print(json.dumps(r), flush=True)


def main():
    _arm_watchdog()
    default_dev = jax.devices()[0]
    on_tpu = default_dev.platform != "cpu"
    cpu_base = _load_cpu_baseline()

    # 1. Pre-warm the relay with a throwaway executable (the first 1-3
    #    executions of any fresh executable are ~1000x slower). A
    #    backlogged tunnel HANGS rather than raising (observed: bench
    #    run immediately after heavy use emitted the 0.0 fallback), so
    #    each attempt runs in a worker thread with a timeout and the
    #    main thread idles between attempts — the tunnel recovers after
    #    ~1-4 min idle (CLAUDE.md).
    tiny = jax.jit(lambda x: x + 1.0)

    def _tiny_once(timeout_s: float) -> bool:
        done = threading.Event()

        def work():
            try:
                float(tiny(jnp.zeros(())))
                done.set()
            except Exception:
                pass

        threading.Thread(target=work, daemon=True).start()
        return done.wait(timeout_s)

    for attempt in range(4):
        if _tiny_once(25.0):
            if attempt == 0:
                # Healthy relay: finish the standard 3-rep warm-up.
                for _ in range(2):
                    _tiny_once(25.0)
            break
        if _elapsed() > MEASURE_CUTOFF_S - 150.0:
            break
        print(f"# warmup attempt {attempt} stalled; idling",
              file=sys.stderr)
        time.sleep(50.0)

    # 2. Build + compile the workload.
    n_particles = 1 << 20 if on_tpu else 1 << 16
    reps = 16 if on_tpu else 4
    run, work = build_pf(n_particles, 32)

    def many(key):
        def body(carry, i):
            return carry + run(jax.random.fold_in(key, i)), None

        total, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(reps))
        return total

    fn = jax.jit(many)
    key = jax.device_put(jax.random.key(0), default_dev)

    def one_chunk(i: int) -> float:
        t0 = time.perf_counter()
        float(fn(jax.random.fold_in(key, i)))
        return time.perf_counter() - t0

    # Compile + push past the fresh-executable lazy-init slow runs.
    warm_runs = 0
    for i in range(2):
        if _elapsed() > MEASURE_CUTOFF_S:
            break
        try:
            one_chunk(i)
            warm_runs += 1
        except Exception as e:
            print(f"# warmup chunk failed ({e!r}); idle backoff",
                  file=sys.stderr)
            if _elapsed() < MEASURE_CUTOFF_S - 120.0:
                time.sleep(75.0)

    # 3. Timed chunks: update the best-so-far after EVERY completed chunk
    #    so the watchdog always has the freshest real number.
    times: list[float] = []
    chunk_id = warm_runs
    retries_left = 2
    while len(times) < 5 and _elapsed() < MEASURE_CUTOFF_S:
        chunk_id += 1
        try:
            dt = one_chunk(chunk_id)
        except Exception as e:
            print(f"# timed chunk failed ({e!r})", file=sys.stderr)
            if retries_left > 0 and _elapsed() < MEASURE_CUTOFF_S - 120.0:
                retries_left -= 1
                time.sleep(75.0)
                continue
            break
        times.append(dt)
        med = sorted(times)[len(times) // 2]
        throughput = work * reps / med
        vsb = throughput / cpu_base if (on_tpu and cpu_base) else 1.0
        _update_best(throughput, len(times), vsb)

    _emit()
    _run_extra_configs(on_tpu)


if __name__ == "__main__":
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
    # in-process (see CLAUDE.md) so local CPU smoke tests never touch
    # the tunnel.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/genjax_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    main()
