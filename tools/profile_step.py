#!/usr/bin/env python
"""Profile the jitted train step and print the on-device op-time anatomy.

Runs a few steps of the bench scene under jax.profiler.trace, then parses
the captured xplane proto (TensorFlow profiler format) and aggregates
device-plane event durations by op name — the PERF.md "step anatomy"
numbers. Same knobs as bench.py: BENCH_POINTS / BENCH_RES / BENCH_RENDERER.

    BENCH_POINTS=1048576 BENCH_RES=1080 python tools/profile_step.py
"""
from __future__ import annotations

import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_profiled(trace_dir: str, n_iters: int = 6):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from opensplat_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()
    from opensplat_tpu.config import TrainConfig
    from opensplat_tpu.models.gaussians import init_model
    from opensplat_tpu.optim.adam import means_lr_schedule
    from opensplat_tpu.train import train_step

    n_points = int(os.environ.get("BENCH_POINTS", 131072))
    h = w = int(os.environ.get("BENCH_RES", 512))
    default_renderer = "pallas" if jax.default_backend() == "tpu" else "tiled"
    renderer = os.environ.get("BENCH_RENDERER", default_renderer)

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, (n_points, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (n_points, 3)).astype(np.uint8)
    state = init_model(pts, rgb, sh_degree=3, capacity=n_points, seed=0)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.0, 0.0, 6.0]
    gt = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    cfg = TrainConfig(num_iters=30000, capacity_round=n_points)
    args = dict(
        cam_to_world=jnp.asarray(c2w), fx=0.9 * w, fy=0.9 * w,
        cx=w / 2.0, cy=h / 2.0, gt_image=gt,
        means_lr=means_lr_schedule(cfg.lr_means, cfg.lr_means_final,
                                   cfg.num_iters, 0),
        height=h, width=w, sh_deg=3, cfg=cfg, accumulate=True,
        renderer=renderer,
    )
    state, m = train_step(state, **args)
    jax.block_until_ready(m["loss"])
    if renderer in ("tiled", "pallas") and int(m["n_cands"]) > 0:
        # same budget adoption as bench.py (incl. grad_budget — without
        # it the gid payload sort runs at the uncompacted safe default
        # and the anatomy overstates the sort line)
        fit = lambda d: (int(int(d) * 1.15) + 131071) // 131072 * 131072
        args["isect_budget"] = fit(m["n_cands"])
        if int(m["n_isects"]) > 0:
            args["layout_budget"] = fit(m["n_isects"])
        if int(m.get("n_grads", 0)) > 0:
            args["grad_budget"] = fit(m["n_grads"])
        state, m = train_step(state, **args)
        jax.block_until_ready(m["loss"])

    with jax.profiler.trace(trace_dir):
        for _ in range(n_iters):
            state, m = train_step(state, **args)
        jax.block_until_ready(m["loss"])
    return n_iters, renderer, n_points, h


def parse_xplane(trace_dir: str, n_iters: int, top: int = 40):
    """Aggregate device-plane XLA-op durations by op-name stem.

    Uses jax's bundled xplane reader (jax.profiler.ProfileData) — no
    tensorflow dependency. Durations come from the device_duration_ps
    stat on the "XLA Ops" line of the /device:TPU plane (falls back to
    the event wall duration when the stat is absent, e.g. CPU planes).
    """
    from jax.profiler import ProfileData

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    assert paths, f"no xplane under {trace_dir}"
    prof = ProfileData.from_file(max(paths, key=os.path.getmtime))

    agg = defaultdict(float)
    step_ms = []
    total = 0.0
    for plane in prof.planes:
        if not (plane.name.startswith("/device:TPU")
                or plane.name.startswith("/device:CPU")):
            continue
        for line in plane.lines:
            if line.name == "Steps":
                step_ms += [e.duration_ns / 1e6 for e in line.events]
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur_ns = ev.duration_ns
                for k, v in ev.stats:
                    if k == "device_duration_ps":
                        dur_ns = float(v) / 1e3
                        break
                # "%opname.12 = f32[...] opcode(...)" -> "opname"
                # (PROFILE_FULL_NAMES=1 keeps the .12 so individual
                # fusions can be ranked instead of lumped)
                stem = ev.name.split(" = ")[0].strip("%")
                if not os.environ.get("PROFILE_FULL_NAMES"):
                    stem = stem.rstrip("0123456789").rstrip(".")
                ms = dur_ns / 1e6
                agg[stem] += ms
                total += ms
    if step_ms:
        print(f"step wall times (ms): "
              f"{', '.join(f'{t:.1f}' for t in sorted(step_ms))}")
    print(f"\n== device op time over {n_iters} steps "
          f"(total {total:.1f} ms, {total / n_iters:.1f} ms/step) ==")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms / n_iters:9.3f} ms/step  {100 * ms / max(total, 1e-9):5.1f}%  {name}")


def main():
    trace_dir = os.environ.get("PROFILE_DIR") or tempfile.mkdtemp(
        prefix="opensplat_prof_"
    )
    n_iters, renderer, n_points, res = run_profiled(trace_dir)
    print(f"config: {renderer} {n_points}g @ {res}px; trace in {trace_dir}")
    parse_xplane(trace_dir, n_iters)


if __name__ == "__main__":
    main()
