"""Batch trainer: S independent scenes in one XLA program.

    python -m opensplat_tpu.multi_scene_cli projA projB ... -o out/

A capability the reference does not have (it is strictly single-scene,
opensplat.cpp:151-196): production pipelines that reconstruct many
objects captured with the same rig train them simultaneously — one
scene per device when a mesh is requested (--sharded), or vmapped on
one chip. Training semantics per scene are identical to the main CLI
(same sampler order, refine schedule with the per-scene camera-count
guard, budgets); only the batching is new.
"""
from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="opensplat-batch",
        description="Train multiple 3D Gaussian Splatting scenes in one "
        "batched program (one scene per device on a mesh)",
    )
    p.add_argument("projects", nargs="+",
                   help="Project roots (colmap/nerfstudio/opensfm/odm/"
                   "openmvg); all scenes must share image dimensions")
    p.add_argument("-o", "--output-dir", default="batch_out",
                   help="Directory for per-scene output PLYs "
                   "(<project-basename>.ply)")
    p.add_argument("-n", "--num-iters", type=int, default=30000)
    p.add_argument("-d", "--downscale-factor", type=float, default=1.0)
    p.add_argument("--renderer", default="auto",
                   choices=["auto", "dense", "tiled", "pallas"])
    p.add_argument("--sh-degree", type=int, default=3)
    p.add_argument("--refine-every", type=int, default=100)
    p.add_argument("--warmup-length", type=int, default=500)
    p.add_argument("--capacity", type=int, default=None)
    p.add_argument("--sharded", action="store_true",
                   help="Shard the scene axis over the device mesh "
                   "(one-or-more scenes per device); default runs the "
                   "vmapped batch on the default device")
    p.add_argument("--cpu", action="store_true",
                   help="Force the CPU backend")
    p.add_argument("--keep-crs", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from .cli import _enable_compilation_cache, pick_renderer
    from .config import TrainConfig
    from .data.dataset import input_data_from_x
    from .io.scene_io import save_scene
    from .models.gaussians import init_model
    from .parallel.mesh import make_mesh
    from .parallel.multi_scene import MultiSceneTrainer

    _enable_compilation_cache()
    cfg = TrainConfig(
        num_iters=args.num_iters,
        downscale_factor=args.downscale_factor,
        sh_degree=args.sh_degree,
        refine_every=args.refine_every,
        warmup_length=args.warmup_length,
        capacity=args.capacity,
        renderer=args.renderer,
    )

    inputs, states, cams = [], [], []
    for root in args.projects:
        data = input_data_from_x(root, "")
        for c in data.cameras:
            c.load_image(cfg.downscale_factor)
        inputs.append(data)
        cams.append(data.cameras)
        states.append(
            init_model(
                data.points_xyz, data.points_rgb, sh_degree=cfg.sh_degree,
                capacity=cfg.capacity, capacity_round=cfg.capacity_round,
                seed=cfg.seed,
            )
        )

    mesh = None
    if args.sharded:
        n = len(jax.devices())
        n_data = n
        while n_data > 1 and len(states) % n_data:
            n_data -= 1
        mesh = make_mesh(n_data=n_data, n_model=1,
                         devices=jax.devices()[:n_data])
        print(f"Sharded: {len(states)} scenes over {n_data} devices")

    trainer = MultiSceneTrainer(
        states, cams, cfg, renderer=pick_renderer(cfg.renderer), mesh=mesh
    )

    display = 10 if jax.default_backend() != "cpu" else 1
    for step in range(1, cfg.num_iters + 1):
        out = trainer.run_step(step)
        if step % display == 0 or step == cfg.num_iters:
            per = ", ".join(
                f"{l:.4f}" for l in np.asarray(out._metrics["loss_per_scene"])
            )
            print(
                f"Step {step}: mean loss {out.loss:.6f} [{per}] "
                f"({trainer.refine_metrics is not None and 'refined' or ''})",
                flush=True,
            )

    os.makedirs(args.output_dir, exist_ok=True)
    used = set()
    for root, data, st in zip(args.projects, inputs, trainer.scene_states()):
        name = os.path.basename(os.path.normpath(root)) or "scene"
        uniq, k = name, 1
        while uniq in used:  # two projects may share a basename
            uniq, k = f"{name}_{k}", k + 1
        used.add(uniq)
        out_path = os.path.join(args.output_dir, f"{uniq}.ply")
        save_scene(
            st.params, st.alive, out_path, cfg.num_iters,
            keep_crs=args.keep_crs, scale=data.scale,
            translation=data.translation,
        )
        print(f"Wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
