"""Worker for tests/test_distributed.py::test_two_process_dp_training:
runs the REAL DPTrainer over a 2-process 8-device mesh (4 CPU devices
per process) and prints a deterministic parameter checksum that must
match the single-process 8-device run byte-for-byte."""
import os
import sys


def build_scene():
    """Deterministic tiny scene shared by workers and the in-test
    single-process reference (must import jax lazily)."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(__file__))
    from test_train_synthetic import (
        _ground_truth_state,
        _make_cameras,
        _render_targets,
    )

    cams = _make_cameras(n_cams=8, H=32, W=32, f=40.0)
    gt_state = _ground_truth_state(n=40, capacity=64)
    targets = _render_targets(gt_state, cams)
    for cam, img in zip(cams, targets):
        cam.set_image(img)
    rng = np.random.default_rng(9)
    pts = np.asarray(gt_state.params.means)[np.asarray(gt_state.alive)]
    pts = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    rgb = rng.integers(0, 255, (pts.shape[0], 3)).astype(np.uint8)
    return cams, pts, rgb


def run_dp(mesh, cams, pts, rgb, n_steps=12):
    from opensplat_tpu.config import TrainConfig
    from opensplat_tpu.models.gaussians import init_model
    from opensplat_tpu.parallel.dp_trainer import DPTrainer

    cfg = TrainConfig(
        num_iters=60, sh_degree=1, num_downscales=0,
        warmup_length=4, refine_every=10, capacity_round=64,
    )
    state = init_model(pts, rgb, sh_degree=1, capacity=64,
                       capacity_round=64, seed=3)
    tr = DPTrainer(state, cams, cfg, renderer="dense", mesh=mesh)
    for step in range(1, n_steps + 1):
        out = tr.run_step(step)
    return tr, out


def checksum(tr):
    import numpy as np

    parts = [
        float(np.float64(np.asarray(leaf, np.float64).sum()))
        for leaf in [tr.state.params.means, tr.state.params.scales,
                     tr.state.params.opacities]
    ]
    return " ".join(f"{p:.10e}" for p in parts) + f" alive={int(np.asarray(tr.state.alive).sum())}"


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["OPENSPLAT_COORDINATOR"] = f"localhost:{port}"
    os.environ["OPENSPLAT_NUM_PROCESSES"] = "2"
    os.environ["OPENSPLAT_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from opensplat_tpu.parallel.distributed import (
        global_dp_mesh,
        initialize_from_env,
    )

    assert initialize_from_env()
    mesh = global_dp_mesh()
    assert mesh.shape["data"] == 8

    cams, pts, rgb = build_scene()
    tr, out = run_dp(mesh, cams, pts, rgb)
    print(f"DP_DIST_OK {pid} loss={out.loss:.8f} sum: {checksum(tr)}")


if __name__ == "__main__":
    main()
