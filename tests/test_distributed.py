"""Multi-process (multi-host) runtime tests.

The reference validates multi-GPU only by running multiproc.py on real
hardware (/root/reference/multiproc.py; SURVEY §4 item 4). Here the process
boundary is tested for real on CPU: two subprocesses rendezvous through
``jax.distributed`` on localhost, run a cross-process collective, shard the
dataset per host, and exercise host-0-only checkpoint I/O — no TPU needed.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_initialize_distributed_noop_without_coordinator(monkeypatch):
    """No explicit args, no coordinator env vars -> single-process no-op
    (never silently half-initializes; mesh.py ordering contract)."""
    from tacotron2_tpu.parallel.mesh import (
        _COORDINATOR_ENV_VARS, _multiprocess_env, initialize_distributed,
    )
    for var in _COORDINATOR_ENV_VARS:
        monkeypatch.delenv(var, raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    initialize_distributed()  # must not raise and must not rendezvous
    import jax

    assert jax.process_count() == 1
    # single-entry worker list (a plain single-host TPU VM) is NOT
    # multi-process; two entries are
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert not _multiprocess_env()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
    assert _multiprocess_env()


def test_two_process_rendezvous(tmp_path):
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, addr, "2", str(pid), str(tmp_path)],
            env=env, cwd=REPO_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    results = {}
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results[pid] = json.load(f)

    for pid, r in results.items():
        assert r["process_count"] == 2
        assert r["n_local"] == 2
        assert r["n_global"] == 4
        # dp-sharded global sum: 2 rows of 1.0 + 2 rows of 2.0, 8 cols
        assert r["total"] == pytest.approx(2 * 8 * 1.0 + 2 * 8 * 2.0)
        # strided per-host dataset shard (DistributedSampler equivalent)
        assert r["indices"] == list(range(pid, 10, 2))

    # host-0-only checkpoint I/O
    assert results[0]["ckpt_path"] is not None
    assert os.path.exists(results[0]["ckpt_path"])
    assert results[1]["ckpt_path"] is None
