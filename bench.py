"""Benchmark harness: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Headline metric (BASELINE.md config 1): SIR importance-sampling throughput
(particles/s) on the README beta-bernoulli model, K=2048 particles x 64
vmapped trials under one jit. ``vs_baseline`` is the speedup of the default
backend (TPU) over the in-process CPU backend running the identical program
— the reference publishes no numbers (BASELINE.json: published={}), so
host-CPU XLA is the stand-in baseline.
"""

import json
import time

import jax
import jax.numpy as jnp


def build_workload(k_particles=2048, trials=64):
    import genjax_tpu as g
    from genjax_tpu.inference import ImportanceK, Target

    @g.gen
    def beta_bernoulli(a, b):
        p = g.beta(a, b) @ "p"
        v = g.flip(p) @ "v"
        return v

    target = Target(beta_bernoulli, (2.0, 2.0), g.C["v"].set(True))
    alg = ImportanceK(target, k_particles=k_particles)

    def run(key):
        keys = jax.random.split(key, trials)
        col = jax.vmap(alg.run_smc)(keys)
        # posterior mean + logZ per trial: forces full materialization.
        w = jax.nn.softmax(col.get_log_weights(), axis=-1)
        ps = col.get_particles().get_choices()["p"]
        return jnp.sum(w * ps, axis=-1), col.get_log_marginal_likelihood_estimate()

    return run, k_particles * trials


def time_throughput(run, work, device, reps=20):
    fn = jax.jit(run)
    key = jax.device_put(jax.random.key(0), device)
    out = fn(key)
    jax.block_until_ready(out)  # compile + warmup
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(jax.device_put(jax.random.fold_in(key, i), device))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return work * reps / dt


def main():
    run, work = build_workload()
    default_dev = jax.devices()[0]
    throughput = time_throughput(run, work, default_dev)

    vs_baseline = 1.0
    if default_dev.platform != "cpu":
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                cpu_run, cpu_work = build_workload()
                cpu_throughput = time_throughput(cpu_run, cpu_work, cpu, reps=5)
            vs_baseline = throughput / cpu_throughput
        except Exception:
            vs_baseline = 1.0

    print(json.dumps({
        "metric": "sir_beta_bernoulli_throughput",
        "value": round(throughput, 1),
        "unit": "particles/s",
        "vs_baseline": round(float(vs_baseline), 3),
    }))


if __name__ == "__main__":
    main()
