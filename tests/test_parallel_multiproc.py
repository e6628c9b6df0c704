"""True 2-process jax.distributed test: two CPU processes, one global
(chain, g) mesh, one sharded Gibbs chunk, and a cross-process allgather.

This exercises the multi-host path (parallel/multihost.py) end-to-end where
test_parallel.py's coverage is single-process: distributed bootstrap, hybrid
mesh construction, make_array_from_callback data sharding, a jitted chunk
over a partially-addressable state, and a DCN-axis collective gather."""

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


def test_two_process_distributed_chunk():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    repo = os.path.dirname(os.path.dirname(worker))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count (2)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            # 2 procs x 4 chains, 50 iterations (a real chunk, not a smoke)
            [sys.executable, worker, str(pid), str(port), "2", "4", "50"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(worker)))
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"WORKER_OK pid={pid}" in out, out
