"""True multi-process test: two OS processes, one CPU device each, joined
by `multihost.initialize` into a single 2-device JAX job running one
camera-DP train step with a cross-process gradient psum (SURVEY.md §2.3,
VERDICT round-2 ask #2)."""
import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # ~30 s: two cold JAX starts + distributed setup


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_step():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(r), "2", coord],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out
        results.append(json.loads(lines[-1][len("RESULT "):]))
    assert {r["rank"] for r in results} == {0, 1}
    for r in results:
        assert r["process_count"] == 2
        assert r["device_count"] == 2
        assert r["param_delta"] > 0
    # the psum'd global loss must agree bit-for-bit across ranks
    assert results[0]["loss"] == results[1]["loss"]


def test_initialize_noop_on_plain_single_host(monkeypatch):
    """Without explicit args or cluster env, initialize() is a documented
    no-op that never touches jax.distributed."""
    from gaussian_mesh_splatting_tpu.parallel import multihost

    for v in multihost._CLUSTER_ENV_VARS:
        monkeypatch.delenv(v, raising=False)
    if multihost._initialized:
        pytest.skip("distributed runtime already up in this process")
    assert multihost.initialize() is False
    assert not multihost.is_initialized()
