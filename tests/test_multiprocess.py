"""True multi-process data parallelism (the reference's ddp_spawn test).

Launches 2 real OS processes that join one JAX runtime over a local
coordinator, run per-host-sharded loading + a globally-sharded train step,
and must end with bit-identical parameters (XLA's cross-process all-reduce
≙ NCCL allreduce; ref: /root/reference/tests/test_train.py:65-77).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "helpers" / "mp_train_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_step():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            # exactly one local device per process, even when the parent test
            # run exported an 8-device virtual mesh (S2S_CPU_MESH)
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )
        env.pop("S2S_CPU_MESH", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(WORKER)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    lines = [
        next(line for line in out.splitlines() if line.startswith("MPOK")) for out in outs
    ]
    checksums = {line.split("checksum=")[1] for line in lines}
    losses = {line.split("loss=")[1].split()[0] for line in lines}
    assert len(checksums) == 1, f"params diverged across processes: {lines}"
    assert len(losses) == 1, f"losses diverged across processes: {lines}"
