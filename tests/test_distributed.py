"""Multi-host bootstrap smoke test: TWO real OS processes join through
`parallel.distributed.initialize_from_env` (coordinator env vars), build
a host-spanning ('data', 'model') mesh, assemble a global batch from
per-process rows, and run one cross-process all-reduce.

This is the CPU stand-in for the >=2-host TPU recipe documented in
parallel/distributed.py (BASELINE.md scaling row)."""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_bootstrap():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
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
        assert f"DIST_OK {pid}" in out, out


def test_two_process_dp_training():
    """END-TO-END multi-host training: the real DPTrainer runs over a
    2-process 8-device mesh (4 CPU devices per host, gradient psum
    crossing the process boundary every step, refine event at step 10)
    and must produce the SAME parameters as the single-process 8-device
    run — the sharding/collective layout changes, the math must not."""
    import numpy as np

    import distributed_dp_worker as w

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__),
                          "distributed_dp_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    lines = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        match = [ln for ln in out.splitlines()
                 if ln.startswith(f"DP_DIST_OK {pid}")]
        assert match, out[-2000:]
        lines.append(match[0].split(" ", 2)[2])
    # both processes agree on the result
    assert lines[0] == lines[1], lines

    # single-process 8-device reference in THIS process (conftest mesh)
    import jax

    from opensplat_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cams, pts, rgb = w.build_scene()
    mesh = make_mesh(n_data=8, n_model=1, devices=jax.devices()[:8])
    tr, out = w.run_dp(mesh, cams, pts, rgb)
    ref = f"loss={out.loss:.8f} sum: {w.checksum(tr)}"
    # fp tolerance: the 2-host gradient psum reduces in a different
    # order than the 8-device single-host psum
    ref_vals = [float(x) for x in ref.replace("loss=", "").replace(
        "sum: ", "").replace("alive=", "").split()]
    got_vals = [float(x) for x in lines[0].replace("loss=", "").replace(
        "sum: ", "").replace("alive=", "").split()]
    np.testing.assert_allclose(got_vals, ref_vals, rtol=1e-4)
