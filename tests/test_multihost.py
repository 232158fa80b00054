"""Multi-host entry points exercised for real: two OS processes join a
jax.distributed CPU runtime (4 virtual devices each), build the global
8-device mesh, and run a psum-sharded contraction that must match
numpy. This covers ``maybe_init_distributed`` + ``get_global_mesh`` +
``contract_sharded`` end to end (reference analog:
``/root/reference/examples/ex_mpi_spmd.py``)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_contract():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        # the repo import must win over any installed copy
        env["PYTHONPATH"] = root
        procs.append(
            subprocess.Popen(
                [sys.executable, worker],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=root,
            )
        )

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"OK-MULTIHOST p{pid}" in out, out
