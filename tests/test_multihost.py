"""Multi-host (multi-process) data-parallel training over a REAL process
boundary: two OS processes, 4 virtual CPU devices each, one global
('dp',) mesh — the `glamr-train --multihost` code path (SURVEY §2.9,
replacing the reference's torch.distributed/NCCL DDP). A single-process
8-device mesh cannot catch non-addressable-sharding bugs; this does.
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_training():
    port = _free_port()
    coord = f"localhost:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/.cache/jax"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"proc {i} failed:\n{err[-4000:]}"
        ok = [ln for ln in out.splitlines() if ln.startswith("MULTIHOST_OK")]
        assert ok, f"proc {i} missing OK line:\n{out[-2000:]}\n{err[-2000:]}"
        outs.append(ok[0])
    # replicated state => both processes observed the identical loss
    assert outs[0] == outs[1], outs
