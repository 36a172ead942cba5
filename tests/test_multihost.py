"""Multi-host (multi-process) input pipeline, exercised for REAL.

Launches TWO OS processes under ``jax.distributed`` (CPU backend, 4 virtual
devices each => one 8-device 'data' mesh), each feeding only its local half
of the global batch via ``parallel.input.host_local_batches``, running one
DP train step — then checks both processes report identical replicated
metrics AND that those metrics equal a single-process run of the same
global batch (DP over processes == DP within one process).

This is the end-to-end validation SURVEY §2.11's DCN-input row calls for,
without TPU hardware (VERDICT r1 item 8).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append(
        f"--xla_force_host_platform_device_count={n_local_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # no TPU plugin in workers
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    return env


def _parse(stdout: str) -> dict:
    for line in stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in:\n{stdout}")


@pytest.mark.slow
def test_two_process_input_matches_single_process():
    coordinator = f"localhost:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(pid), "multi"],
            env=_env(4), cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    r0, r1 = (_parse(o) for o in outs)

    # replicated metrics agree across processes
    assert r0["gen_cost"] == pytest.approx(r1["gen_cost"], abs=1e-6)
    assert r0["disc_cost"] == pytest.approx(r1["disc_cost"], abs=1e-6)

    # and equal the single-process oracle on the same global batch
    single = subprocess.run(
        [sys.executable, WORKER, "unused", "0", "single"],
        env=_env(8), cwd=REPO, capture_output=True, text=True, timeout=540)
    assert single.returncode == 0, single.stdout[-3000:] + single.stderr[-2000:]
    ref = _parse(single.stdout)
    assert r0["gen_cost"] == pytest.approx(ref["gen_cost"], abs=1e-5)
    assert r0["disc_cost"] == pytest.approx(ref["disc_cost"], abs=1e-5)


@pytest.mark.slow
def test_two_process_orbax_checkpoint(tmp_path):
    """Both processes of a jax.distributed run save ONE orbax checkpoint
    (each writing its shards; orbax coordinates the commit) and restore it
    into the placed state — the multi-host checkpoint story VERDICT r4
    item 3 asks to exercise end-to-end."""
    coordinator = f"localhost:{_free_port()}"
    ckpt = str(tmp_path / "ckpt_1.orbax")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(pid), "multi", ckpt],
            env=_env(4), cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    r0, r1 = (_parse(o) for o in outs)
    assert r0["orbax_ok"] and r1["orbax_ok"]
    assert r0["orbax_extra_iteration"] == 1
    assert os.path.isdir(ckpt)                       # committed directory
    assert os.path.exists(ckpt + ".extra.json")      # process-0 sidecar
