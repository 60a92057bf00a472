"""P4 multi-host substrate test: REAL multi-process execution on CPU.

Spawns two OS processes that `jax.distributed.initialize` against a local
coordinator, build the hybrid (dcn x ici) mesh, and run sharded pairings
with cross-process collectives — the same code path a TPU pod uses, with
CPU gloo collectives standing in for ICI/DCN.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_smoke():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONSTARTUP", None)
    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "pairing_tpu.parallel.launch",
                    "--cpu-smoke",
                    "--coordinator", f"127.0.0.1:{port}",
                    "--num-processes", "2",
                    "--process-id", str(pid),
                    "--per-device-batch", "1",
                ],
                cwd=REPO,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for pr in procs:
        out, _ = pr.communicate(timeout=540)
        outs.append(out)
    for pid, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"process {pid} failed:\n{out}"
        assert ": OK" in out, f"process {pid} missing OK:\n{out}"
