"""Multi-host (multi-process) training path: REAL two-process validation.

The --multihost plumbing (train/loop.py:_setup) was previously untestable
without pod hardware. jax.distributed also works across LOCAL processes over
a localhost coordinator with the CPU backend (gloo collectives), so this
spawns two fresh `python -m vgd_tpu.cli` processes, each owning 2 virtual
CPU devices, forming one 4-device data-parallel mesh:

  * jax.distributed.initialize(coordinator, num_processes, process_id) via
    the VGD_COORDINATOR / VGD_NUM_PROCESSES / VGD_PROCESS_ID env vars,
  * global-batch staging on every process with non-fully-addressable
    sharding placement (loop.py:_dp_put make_array_from_callback path),
  * gradient all-reduce across processes (XLA collectives over gloo),
  * artifact writes gated to process 0 (io/artifacts.py).

Gated behind VGD_MULTIHOST_TEST=1: it spawns two jax processes (~2-4 min on
1 vCPU) and must not surprise unrelated suite runs on shared hosts.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("VGD_MULTIHOST_TEST"),
    reason="spawns two jax processes; set VGD_MULTIHOST_TEST=1 to run")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_mesh_trains(tmp_path):
    port = _free_port()
    out = {i: str(tmp_path / f"proc{i}") for i in (0, 1)}
    procs = {}
    for i in (0, 1):
        env = dict(os.environ,
                   VGD_COORDINATOR=f"127.0.0.1:{port}",
                   VGD_NUM_PROCESSES="2", VGD_PROCESS_ID=str(i))
        env.pop("PYTHONPATH", None)   # breaks axon plugin registration
        procs[i] = subprocess.Popen(
            [sys.executable, "-m", "vgd_tpu.cli", "vae", "--multihost",
             "--device", "cpu", "--num-cpu-devices", "2",
             "--epochs", "1", "--steps-per-epoch", "2",
             "--batch-size", "4", "--dataset-size", "16",
             "--image-size", "64", "--compute-dtype", "float32",
             "--no-epoch-scan", "--out-dir", out[i]],
            cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    logs = {i: p.communicate(timeout=900)[0] for i, p in procs.items()}
    for i in (0, 1):
        assert procs[i].returncode == 0, \
            f"process {i} failed:\n{logs[i][-4000:]}"
    # process 0 writes artifacts; process 1 is gated off
    loss0 = os.path.join(out[0], "vae_loss.jsonl")
    assert os.path.exists(loss0), logs[0][-2000:]
    rows = [json.loads(l) for l in open(loss0) if l.strip()]
    assert rows and all(
        v == v for r in rows for v in r.values() if isinstance(v, float))
    assert not os.path.exists(os.path.join(out[1], "vae_loss.jsonl")), \
        "process 1 must not write artifacts"
