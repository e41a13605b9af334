"""Multi-host runtime path: 2 real processes, cross-process collectives.

Drives tools/multihost_dryrun.py, which spawns 2 worker processes (the
TPU-pod analog: one process per host) each with 2 virtual CPU devices,
initializes jax.distributed against a local coordinator, builds the
hybrid (dcn='dp', ici='tp') mesh, feeds per-host data shards, and runs a
real sharded quantized train step whose gradient all-reduce crosses the
process boundary (Gloo). The reference's equivalent surface is
torch.distributed.launch + init_process_group (ImageNet/main.py:79)."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dryrun():
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_dryrun.py"),
         "--num-processes", "2", "--devices-per-process", "2",
         "--port", str(_free_port()), "--timeout", "420"],
        capture_output=True, text=True, timeout=480, cwd=REPO)
    out = p.stdout + p.stderr
    assert "MULTIHOST DRYRUN PASSED" in out, out[-2000:]
    assert out.count("MULTIHOST OK") == 2, out[-2000:]
    # the TP-sharded serving engine (prefill + decode) also ran across
    # the 2 processes and matched the single-process logits
    assert out.count("SERVING OK") == 2, out[-2000:]
    assert p.returncode == 0
