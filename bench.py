"""Benchmark: full train-step throughput on a synthetic scene.

Default run = the full 131k@512 / 524k@800 / 1M@1080 sweep: one JSON
line per config (steps/s + the BASELINE.md:30-31 metrics Mpix/s, rays/s,
gaussians/s), then the headline 131k@512 line LAST with the whole sweep
attached under "sweep" (the driver records the tail line). Setting
BENCH_POINTS/BENCH_RES keeps the historical single-config single-line
contract.

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

if os.environ.get("BENCH_CPU"):
    # two-layer CPU forcing: some accelerator plugins (e.g. tunneled
    # ones) ignore the env var alone
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def run_dp_bench(d, n_points, h, renderer):
    """Camera-DP train-step throughput on a d-device mesh (cameras/s =
    steps/s * d). Runs on whatever devices exist (real chips, or the
    virtual CPU mesh under XLA_FLAGS=--xla_force_host_platform_device_count)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from opensplat_tpu.config import TrainConfig
    from opensplat_tpu.models.gaussians import init_model
    from opensplat_tpu.optim.adam import means_lr_schedule
    from opensplat_tpu.parallel.dp_trainer import dp_train_step
    from opensplat_tpu.parallel.mesh import make_mesh

    w = h
    assert len(jax.devices()) >= d, (len(jax.devices()), d)
    mesh = make_mesh(n_data=d, n_model=1, devices=jax.devices()[:d])
    rep = NamedSharding(mesh, P())
    cam = NamedSharding(mesh, P("data"))

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, (n_points, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (n_points, 3)).astype(np.uint8)
    state = jax.device_put(
        init_model(pts, rgb, sh_degree=3, capacity=n_points, seed=0), rep
    )
    cfg = TrainConfig(num_iters=30000, capacity_round=n_points)
    c2ws = np.broadcast_to(np.eye(4, dtype=np.float32), (d, 4, 4)).copy()
    c2ws[:, 2, 3] = 6.0 + 0.01 * np.arange(d)
    args = [
        jax.device_put(jnp.asarray(c2ws), cam),
        jax.device_put(jnp.full((d,), 0.9 * w, jnp.float32), cam),
        jax.device_put(jnp.full((d,), 0.9 * w, jnp.float32), cam),
        jax.device_put(jnp.full((d,), w / 2.0, jnp.float32), cam),
        jax.device_put(jnp.full((d,), h / 2.0, jnp.float32), cam),
        jax.device_put(
            jnp.asarray(rng.uniform(0, 1, (d, h, w, 3)).astype(np.float32)),
            cam,
        ),
    ]
    lr = means_lr_schedule(cfg.lr_means, cfg.lr_means_final, cfg.num_iters, 0)
    pend = jax.device_put(jnp.zeros((3,), jnp.int32), rep)

    def step(state, pend, ib=0, lb=0, gb=0):
        return dp_train_step(
            state, *args, lr, pend, mesh, h, w, 3, cfg, True, renderer,
            isect_budget=ib, layout_budget=lb, grad_budget=gb,
        )

    state2, m = step(state, pend)
    jax.block_until_ready(m["loss"])
    ib = lb = gb = 0
    dmd = np.asarray(m["demand"])
    if renderer in ("tiled", "pallas") and dmd[0] > 0:
        bucket = 131072
        fit = lambda v: (int(int(v) * 1.15) + bucket - 1) // bucket * bucket
        ib = fit(dmd[0])
        lb = fit(dmd[1]) if dmd[1] > 0 else 0
        gb = fit(dmd[2]) if len(dmd) > 2 and dmd[2] > 0 else 0
        state2, m = step(state, pend, ib, lb, gb)
        jax.block_until_ready(m["loss"])

    n_iters = int(os.environ.get("BENCH_ITERS", 20))
    t0 = time.perf_counter()
    st = state2
    for _ in range(n_iters):
        st, m = step(st, m["demand"], ib, lb, gb)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    steps_per_sec = n_iters / dt
    print(json.dumps({
        "metric": f"dp_train_steps_per_sec[{renderer},{n_points}g,{h}px,dp{d}]",
        "value": round(steps_per_sec, 3),
        "unit": f"steps/s ({d} cameras/step)",
        "vs_baseline": None,
        **_derived(steps_per_sec, h, w, int(m["n_alive"]), cams_per_step=d),
    }))


def run_hybrid_bench(d, m, n_points, h, renderer):
    """Hybrid camera-DP x Gaussian-MP train-step throughput on a
    (d, m) 2D mesh: d cameras/step, capacity sharded 1/m per device
    (BENCH_DP=D BENCH_MP=M together — the CLI `--data-parallel D
    --model-parallel M` path)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from opensplat_tpu.config import TrainConfig
    from opensplat_tpu.models.gaussians import init_model
    from opensplat_tpu.optim.adam import means_lr_schedule
    from opensplat_tpu.parallel.gaussian_shard import (
        dpgs_train_step, shard_state,
    )
    from opensplat_tpu.parallel.mesh import make_mesh

    w = h
    assert len(jax.devices()) >= d * m, (len(jax.devices()), d, m)
    mesh = make_mesh(n_data=d, n_model=m, devices=jax.devices()[:d * m])
    cam = NamedSharding(mesh, P("data"))

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, (n_points, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (n_points, 3)).astype(np.uint8)
    state = shard_state(
        mesh, init_model(pts, rgb, sh_degree=3, capacity=n_points, seed=0)
    )
    cfg = TrainConfig(num_iters=30000, capacity_round=n_points)
    c2ws = np.broadcast_to(np.eye(4, dtype=np.float32), (d, 4, 4)).copy()
    c2ws[:, 2, 3] = 6.0 + 0.01 * np.arange(d)
    args = [
        jax.device_put(jnp.asarray(c2ws), cam),
        jax.device_put(jnp.full((d,), 0.9 * w, jnp.float32), cam),
        jax.device_put(jnp.full((d,), 0.9 * w, jnp.float32), cam),
        jax.device_put(jnp.full((d,), w / 2.0, jnp.float32), cam),
        jax.device_put(jnp.full((d,), h / 2.0, jnp.float32), cam),
        jax.device_put(
            jnp.asarray(rng.uniform(0, 1, (d, h, w, 3)).astype(np.float32)),
            cam,
        ),
    ]
    lr = means_lr_schedule(cfg.lr_means, cfg.lr_means_final, cfg.num_iters, 0)

    def step(state, ib=0, lb=0, gb=0, v=n_points // m):
        return dpgs_train_step(
            state, *args, lr, mesh, h, w, 3, cfg, True, v_budget=v,
            renderer=renderer, isect_budget=ib, layout_budget=lb,
            grad_budget=gb,
        )

    state2, mm = step(state)
    jax.block_until_ready(mm["loss"])
    dmd = np.asarray(mm["demand"])
    ib = lb = gb = 0
    v = n_points // m
    if dmd[3] > 0:
        v = min(n_points // m, (int(dmd[3] * 1.3) + 1023) // 1024 * 1024)
    if renderer in ("tiled", "pallas") and dmd[0] > 0:
        bucket = 131072
        fit = lambda x: (int(int(x) * 1.15) + bucket - 1) // bucket * bucket
        ib = fit(dmd[0])
        lb = fit(dmd[1]) if dmd[1] > 0 else 0
        gb = fit(dmd[2]) if dmd[2] > 0 else 0
    state2, mm = step(state, ib, lb, gb, v)
    jax.block_until_ready(mm["loss"])

    n_iters = int(os.environ.get("BENCH_ITERS", 20))
    t0 = time.perf_counter()
    st = state2
    for _ in range(n_iters):
        st, mm = step(st, ib, lb, gb, v)
    jax.block_until_ready(mm["loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": (
            f"hybrid_train_steps_per_sec[{renderer},{n_points}g,{h}px,"
            f"dp{d}xmp{m}]"
        ),
        "value": round(n_iters / dt, 3),
        "unit": f"steps/s ({d} cameras/step, capacity 1/{m})",
        "vs_baseline": None,
        **_derived(n_iters / dt, h, w, int(mm["n_alive"]), cams_per_step=d),
    }))


def run_mp_bench(m, n_points, h, renderer):
    """Gaussian-model-parallel train-step throughput on an m-device mesh
    (capacity sharded 1/m per device; all-gather of visible subsets +
    banded raster + reduce-scatter grads per step)."""
    import jax
    import jax.numpy as jnp

    from opensplat_tpu.config import TrainConfig
    from opensplat_tpu.models.gaussians import init_model
    from opensplat_tpu.optim.adam import means_lr_schedule
    from opensplat_tpu.parallel.gaussian_shard import gs_train_step, shard_state
    from opensplat_tpu.parallel.mesh import make_mesh

    w = h
    assert len(jax.devices()) >= m, (len(jax.devices()), m)
    mesh = make_mesh(n_data=1, n_model=m, devices=jax.devices()[:m])

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, (n_points, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (n_points, 3)).astype(np.uint8)
    state = shard_state(
        mesh, init_model(pts, rgb, sh_degree=3, capacity=n_points, seed=0)
    )
    cfg = TrainConfig(num_iters=30000, capacity_round=n_points)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.0, 0.0, 6.0]
    gt = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    lr = means_lr_schedule(cfg.lr_means, cfg.lr_means_final, cfg.num_iters, 0)

    def step(state, ib=0, lb=0, gb=0, v=n_points // m):
        return gs_train_step(
            state, jnp.asarray(c2w), 0.9 * w, 0.9 * w, w / 2.0, h / 2.0,
            gt, lr, mesh, h, w, 3, cfg, True, v_budget=v,
            renderer=renderer, isect_budget=ib, layout_budget=lb,
            grad_budget=gb,
        )

    state2, mm = step(state)
    jax.block_until_ready(mm["loss"])
    dmd = np.asarray(mm["demand"])
    ib = lb = gb = 0
    v = n_points // m
    if dmd[3] > 0:
        v = min(n_points // m, (int(dmd[3] * 1.3) + 1023) // 1024 * 1024)
    if renderer in ("tiled", "pallas") and dmd[0] > 0:
        bucket = 131072
        fit = lambda x: (int(int(x) * 1.15) + bucket - 1) // bucket * bucket
        ib = fit(dmd[0])
        lb = fit(dmd[1]) if dmd[1] > 0 else 0
        gb = fit(dmd[2]) if dmd[2] > 0 else 0
    state2, mm = step(state, ib, lb, gb, v)
    jax.block_until_ready(mm["loss"])

    n_iters = int(os.environ.get("BENCH_ITERS", 20))
    t0 = time.perf_counter()
    st = state2
    for _ in range(n_iters):
        st, mm = step(st, ib, lb, gb, v)
    jax.block_until_ready(mm["loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"mp_train_steps_per_sec[{renderer},{n_points}g,{h}px,mp{m}]",
        "value": round(n_iters / dt, 3),
        "unit": f"steps/s (capacity sharded 1/{m})",
        "vs_baseline": None,
        **_derived(n_iters / dt, h, w, int(mm["n_alive"])),
    }))


def run_scenes_bench(s, n_points, h, renderer):
    """Multi-scene batch throughput: S independent scenes advanced in one
    stacked program per step (BENCH_SCENES=S). With BENCH_SCENES_SHARDED=1
    and >= S devices, the scene axis is sharded over `data` (one-or-more
    scenes per device, each running its full local pipeline)."""
    import jax
    import jax.numpy as jnp

    from opensplat_tpu.config import TrainConfig
    from opensplat_tpu.models.gaussians import init_model
    from opensplat_tpu.optim.adam import means_lr_schedule
    from opensplat_tpu.parallel.mesh import make_mesh
    from opensplat_tpu.parallel.multi_scene import (
        multi_scene_train_step, sharded_multi_scene_step, stack_states,
    )

    w = h
    sharded = bool(int(os.environ.get("BENCH_SCENES_SHARDED", "0")))
    mesh = None
    if sharded:
        assert len(jax.devices()) >= s, (len(jax.devices()), s)
        mesh = make_mesh(n_data=s, n_model=1, devices=jax.devices()[:s])

    rng = np.random.default_rng(0)
    states = []
    for i in range(s):
        pts = rng.uniform(-1.5, 1.5, (n_points, 3)).astype(np.float32)
        rgb = rng.integers(0, 255, (n_points, 3)).astype(np.uint8)
        states.append(
            init_model(pts, rgb, sh_degree=3, capacity=n_points, seed=i)
        )
    stacked = stack_states(states)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        put = lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        )
        stacked = jax.tree.map(put, stacked)
    else:
        put = jnp.asarray

    cfg = TrainConfig(num_iters=30000, capacity_round=n_points)
    c2ws = np.broadcast_to(np.eye(4, dtype=np.float32), (s, 4, 4)).copy()
    c2ws[:, 2, 3] = 6.0 + 0.01 * np.arange(s)
    args = [
        put(jnp.asarray(c2ws)),
        put(jnp.full((s,), 0.9 * w, jnp.float32)),
        put(jnp.full((s,), 0.9 * w, jnp.float32)),
        put(jnp.full((s,), w / 2.0, jnp.float32)),
        put(jnp.full((s,), h / 2.0, jnp.float32)),
        put(jnp.asarray(rng.uniform(0, 1, (s, h, w, 3)).astype(np.float32))),
    ]
    lr = means_lr_schedule(cfg.lr_means, cfg.lr_means_final, cfg.num_iters, 0)

    def step(st, ib=0, lb=0, gb=0):
        kw = dict(height=h, width=w, sh_deg=3, cfg=cfg, accumulate=True,
                  renderer=renderer, isect_budget=ib, layout_budget=lb,
                  grad_budget=gb)
        if mesh is not None:
            return sharded_multi_scene_step(st, *args, lr, mesh=mesh, **kw)
        return multi_scene_train_step(st, *args, lr, **kw)

    st2, m = step(stacked)
    jax.block_until_ready(m["loss"])
    ib = lb = gb = 0
    dmd = np.max(np.asarray(m["demand"]), axis=0)
    if renderer in ("tiled", "pallas") and dmd[0] > 0:
        bucket = 131072
        fit = lambda v: (int(int(v) * 1.15) + bucket - 1) // bucket * bucket
        ib = fit(dmd[0])
        lb = fit(dmd[1]) if dmd[1] > 0 else 0
        gb = fit(dmd[2]) if len(dmd) > 2 and dmd[2] > 0 else 0
        st2, m = step(stacked, ib, lb, gb)
        jax.block_until_ready(m["loss"])

    n_iters = int(os.environ.get("BENCH_ITERS", 20))
    t0 = time.perf_counter()
    st = st2
    for _ in range(n_iters):
        st, m = step(st, ib, lb, gb)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    mode = "sharded" if mesh is not None else "vmap"
    print(json.dumps({
        "metric": (
            f"scene_steps_per_sec[{renderer},{n_points}g,{h}px,"
            f"s{s}-{mode}]"
        ),
        "value": round(n_iters * s / dt, 3),
        "unit": f"scene-steps/s ({s} scenes/step)",
        "vs_baseline": None,
        # per-scene alive count (metrics["n_alive"] is the (S,) vector
        # from the raw multi-scene step): scene-steps/s x alive/scene
        **_derived(n_iters * s / dt, h, w,
                   int(np.mean(np.asarray(m["n_alive"])))),
    }))


# The BASELINE.md targets are written in rendered Mpix/s, rays/s and
# gaussians/s (BASELINE.md:30-31) — emit them alongside steps/s. One
# training step renders h*w pixels (1 ray each) and advances every alive
# Gaussian once.
def _derived(steps_per_sec, h, w, n_alive, cams_per_step=1):
    pix = h * w * cams_per_step
    return {
        "mpix_per_sec": round(steps_per_sec * pix / 1e6, 3),
        "rays_per_sec": round(steps_per_sec * pix, 1),
        "gaussians_per_sec": round(steps_per_sec * n_alive, 1),
    }


# default full sweep (VERDICT r2 item 2, + the 16k anchor config per
# VERDICT r4 item 6): every BENCH_ANCHOR size in ONE driver run so
# BENCH_r{N}.json captures a round-over-round trail for each
SWEEP = ((16384, 256), (131072, 512), (524288, 800), (1048576, 1080))
HEADLINE = (131072, 512)


def run_single(n_points, h, renderer, emit=True):
    import jax
    import jax.numpy as jnp

    from opensplat_tpu.config import TrainConfig
    from opensplat_tpu.models.gaussians import init_model
    from opensplat_tpu.optim.adam import means_lr_schedule
    from opensplat_tpu.train import train_step

    capacity = n_points
    w = h
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
        if int(m.get("n_grads", 0)) > 0:
            args["grad_budget"] = fit(m["n_grads"])
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
    metric_name = f"train_steps_per_sec[{renderer},{n_points}g,{h}px]"
    if os.path.exists(anchor_path):
        try:
            anchor = json.load(open(anchor_path))
            ref = anchor.get("per_metric", {}).get(
                metric_name, anchor.get("steps_per_sec")
            )
            if ref:
                vs_baseline = round(steps_per_sec / float(ref), 3)
        except Exception:
            pass

    rec = {
        "metric": metric_name,
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": vs_baseline,
        **_derived(steps_per_sec, h, w, int(m["n_alive"])),
    }
    if emit:
        print(json.dumps(rec))
    return rec


def main():
    import jax

    from opensplat_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    default_renderer = "pallas" if jax.default_backend() == "tpu" else "tiled"
    renderer = os.environ.get("BENCH_RENDERER", default_renderer)
    # BENCH_DP=D: camera-data-parallel step over a D-device mesh
    # (one camera per device, ONE gradient psum) — the v5e-8 target path
    dp = int(os.environ.get("BENCH_DP", 0))
    # BENCH_MP=M: Gaussian-model-parallel step (capacity sharded 1/M —
    # the memory-scaling axis for scenes beyond one chip's HBM);
    # both together = hybrid DPxMP on a (D, M) 2D mesh
    mp = int(os.environ.get("BENCH_MP", 0))
    # BENCH_SCENES=S: S independent scenes per step (multi-scene batch;
    # BENCH_SCENES_SHARDED=1 shards the scene axis over the mesh)
    scenes = int(os.environ.get("BENCH_SCENES", 0))
    n_points_env = os.environ.get("BENCH_POINTS")
    res_env = os.environ.get("BENCH_RES")
    n_points = int(n_points_env or 131072)
    h = int(res_env or 512)
    if dp and mp:
        return run_hybrid_bench(dp, mp, n_points, h, renderer)
    if dp:
        return run_dp_bench(dp, n_points, h, renderer)
    if mp:
        return run_mp_bench(mp, n_points, h, renderer)
    if scenes:
        return run_scenes_bench(scenes, n_points, h, renderer)

    if n_points_env or res_env:
        # explicit single config (the historical BENCH_POINTS/BENCH_RES
        # interface): one JSON line, unchanged contract
        run_single(n_points, h, renderer)
        return

    # default: the full sweep, one JSON line per config, then the
    # headline line (131k@512, the anchor-tracked config) LAST with the
    # whole sweep attached so the driver-parsed record carries every size
    results = {}
    for np_, res_ in SWEEP:
        results[(np_, res_)] = run_single(np_, res_, renderer, emit=True)
    head = dict(results[HEADLINE])
    head["sweep"] = list(results.values())
    print(json.dumps(head))


if __name__ == "__main__":
    sys.exit(main())
