"""Benchmark: full train-step throughput on a synthetic scene.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no quantitative numbers (BASELINE.md), so
vs_baseline is the ratio against a locally-recorded anchor in
BENCH_ANCHOR.json when present, else null. Runs on whatever backend jax
picks (the real TPU chip under the driver).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from opensplat_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from opensplat_tpu.config import TrainConfig
    from opensplat_tpu.models.gaussians import init_model
    from opensplat_tpu.optim.adam import means_lr_schedule
    from opensplat_tpu.train import train_step

    # synthetic scene sized to exercise the renderer meaningfully
    n_points = int(os.environ.get("BENCH_POINTS", 131072))
    capacity = n_points
    h = w = int(os.environ.get("BENCH_RES", 512))
    default_renderer = "pallas" if jax.default_backend() == "tpu" else "tiled"
    renderer = os.environ.get("BENCH_RENDERER", default_renderer)

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, (n_points, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (n_points, 3)).astype(np.uint8)
    state = init_model(pts, rgb, sh_degree=3, capacity=capacity, seed=0)

    eye = np.array([0.0, 0.0, 6.0])
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = eye
    gt = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    cfg = TrainConfig(num_iters=30000, capacity_round=capacity)

    fx = fy = 0.9 * w
    args = dict(
        cam_to_world=jnp.asarray(c2w),
        fx=fx, fy=fy, cx=w / 2.0, cy=h / 2.0,
        gt_image=gt,
        means_lr=means_lr_schedule(cfg.lr_means, cfg.lr_means_final, cfg.num_iters, 0),
        height=h, width=w, sh_deg=3, cfg=cfg, accumulate=True, renderer=renderer,
    )

    # warmup/compile; then adopt the adaptive isect budget like the Trainer
    state, m = train_step(state, **args)
    jax.block_until_ready(m["loss"])
    if renderer in ("tiled", "pallas") and int(m["n_cands"]) > 0:
        bucket = 131072
        fit = lambda d: (int(int(d) * 1.15) + bucket - 1) // bucket * bucket
        args["isect_budget"] = fit(m["n_cands"])
        if int(m["n_isects"]) > 0:
            args["layout_budget"] = fit(m["n_isects"])
        state, m = train_step(state, **args)
        jax.block_until_ready(m["loss"])

    n_iters = int(os.environ.get("BENCH_ITERS", 20))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = train_step(state, **args)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    steps_per_sec = n_iters / dt

    vs_baseline = None
    anchor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_ANCHOR.json")
    if os.path.exists(anchor_path):
        try:
            anchor = json.load(open(anchor_path))
            metric_name = f"train_steps_per_sec[{renderer},{n_points}g,{h}px]"
            ref = anchor.get("per_metric", {}).get(
                metric_name, anchor.get("steps_per_sec")
            )
            if ref:
                vs_baseline = round(steps_per_sec / float(ref), 3)
        except Exception:
            pass

    print(json.dumps({
        "metric": f"train_steps_per_sec[{renderer},{n_points}g,{h}px]",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    sys.exit(main())
