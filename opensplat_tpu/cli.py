"""opensplat-compatible command-line trainer.

Flags mirror the reference CLI name-for-name with identical defaults
(opensplat.cpp:19-51); orchestration mirrors its main()
(opensplat.cpp:121-207): load project, load images in parallel, withhold
a validation camera, train with refine/reset, periodic saves and
validation renders, final cameras.json + scene + validation loss.

TPU-native additions: --renderer (dense|tiled|pallas|auto), --capacity,
--checkpoint-every/--ckpt-dir for exact native resume (includes Adam
moments, unlike PLY resume), and --resume accepts either a .ply or a
native .npz checkpoint.
"""
from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="opensplat",
        description="TPU-native Open Source 3D Gaussian Splats generator",
    )
    p.add_argument("input", nargs="?", help="Path to project root "
                   "(colmap/nerfstudio/opensfm/odm/openmvg)")
    p.add_argument("-i", "--input", dest="input_flag", default=None,
                   help="Path to nerfstudio project")
    p.add_argument("-o", "--output", default="splat.ply",
                   help="Path where to save output scene")
    p.add_argument("-s", "--save-every", type=int, default=-1,
                   help="Save output scene every these many steps (-1 to disable)")
    p.add_argument("--resume", default="",
                   help="Resume training from this PLY file or native .npz checkpoint")
    p.add_argument("--val", action="store_true",
                   help="Withhold a camera shot for validating the scene loss")
    p.add_argument("--val-image", default="random",
                   help="Filename of the image to withhold for validation")
    p.add_argument("--val-render", default="",
                   help="Path of the directory where to render validation images")
    p.add_argument("--keep-crs", action="store_true",
                   help="Retain the project input's coordinate reference system")
    p.add_argument("--cpu", action="store_true", help="Force CPU execution")
    p.add_argument("-n", "--num-iters", type=int, default=30000,
                   help="Number of iterations to run")
    p.add_argument("-d", "--downscale-factor", type=float, default=1.0,
                   help="Scale input images by this factor")
    p.add_argument("--num-downscales", type=int, default=2)
    p.add_argument("--resolution-schedule", type=int, default=3000,
                   help="Double the image resolution every these many steps")
    p.add_argument("--sh-degree", type=int, default=3)
    p.add_argument("--sh-degree-interval", type=int, default=1000)
    p.add_argument("--ssim-weight", type=float, default=0.2)
    p.add_argument("--refine-every", type=int, default=100)
    p.add_argument("--warmup-length", type=int, default=500)
    p.add_argument("--reset-alpha-every", type=int, default=30)
    p.add_argument("--densify-grad-thresh", type=float, default=0.0002)
    p.add_argument("--densify-size-thresh", type=float, default=0.01)
    p.add_argument("--stop-screen-size-at", type=int, default=4000)
    p.add_argument("--split-screen-size", type=float, default=0.05)
    p.add_argument("--colmap-image-path", default="",
                   help="Override the default image path for COLMAP input")
    # TPU-native flags
    p.add_argument("--renderer", default="auto",
                   choices=["auto", "dense", "tiled", "pallas"])
    p.add_argument("--capacity", type=int, default=None,
                   help="Fixed Gaussian capacity (default: auto)")
    p.add_argument("--distributed", action="store_true",
                   help="Join a multi-host fleet before training: "
                   "jax.distributed.initialize via OPENSPLAT_COORDINATOR/"
                   "OPENSPLAT_NUM_PROCESSES/OPENSPLAT_PROCESS_ID (or TPU-pod "
                   "auto-detection). Combine with --data-parallel -1 to "
                   "train over every chip of every host (launch recipe in "
                   "parallel/distributed.py)")
    p.add_argument("--data-parallel", type=int, default=0, metavar="D",
                   help="Camera data-parallelism: train D cameras per "
                   "step, one per device, with gradient all-reduce over "
                   "the chip interconnect (D=-1 uses every device; the "
                   "scaling capability the reference lists as an open "
                   "goal, README.md:268). Each step consumes D cameras, "
                   "so divide -n accordingly for equal epochs")
    p.add_argument("--model-parallel", type=int, default=0, metavar="M",
                   help="Gaussian model-parallelism: shard the Gaussian "
                   "set over M devices (all-gather of frustum-visible "
                   "subsets, one image band per device, reduce-scatter "
                   "of gradients; parameter/optimizer memory scales 1/M "
                   "— for scenes too large for one chip's HBM). M=-1 "
                   "uses every device; combine with --data-parallel D "
                   "for hybrid DPxMP on a 2D (D, M) device mesh")
    p.add_argument("--checkpoint-every", type=int, default=-1,
                   help="Write a native full-state checkpoint every N steps")
    p.add_argument("--gt-cache-mb", type=int, default=1024,
                   help="HBM budget for the device-resident GT image "
                   "cache (LRU per (camera, factor); 0 disables). Avoids "
                   "re-transferring ground-truth images every step")
    p.add_argument("--ckpt-dir", default="",
                   help="Directory for native checkpoints")
    p.add_argument("--metrics-file", default="",
                   help="Write per-step structured metrics (JSONL) here")
    p.add_argument("--profile-dir", default="",
                   help="Capture a jax.profiler device trace into this dir")
    p.add_argument("--auto-resume", action="store_true",
                   help="Resume from the newest native checkpoint in "
                   "--ckpt-dir if one exists (crash/preemption recovery; "
                   "pair with --checkpoint-every)")
    p.add_argument("--serve", type=int, default=0, metavar="PORT",
                   help="Serve the --report-dir live over HTTP during "
                   "training (auto-refreshing page — the headless "
                   "counterpart of the reference's visualizer window)")
    p.add_argument("--report-dir", default="",
                   help="Write a self-contained HTML training report "
                   "(loss/PSNR/population curves + render-vs-GT snapshots) "
                   "— the headless stand-in for the reference's visualizer")
    p.add_argument("--oracle-check", action="store_true",
                   help="After training, reload the saved scene and render "
                   "one view through the NumPy conformance oracle "
                   "(gsplat-cpu port), cross-checking the saved file "
                   "against the TPU pipeline's render")
    p.add_argument("--version", action="version", version="opensplat_tpu 0.1.0")
    return p


def _enable_compilation_cache():
    """Persistent XLA compilation cache: training touches a handful of
    (resolution, capacity, budget) shapes, each a 20-60s TPU compile;
    caching makes restarts and resumed runs start in seconds. Override
    dir with OPENSPLAT_TPU_CACHE; disable with OPENSPLAT_TPU_CACHE=0."""
    import jax

    cache = os.environ.get(
        "OPENSPLAT_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "opensplat_tpu_xla"),
    )
    if cache == "0":
        return
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache


def pick_renderer(choice: str) -> str:
    if choice != "auto":
        return choice
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "tiled"


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    project_root = args.input_flag or args.input
    if not project_root:
        build_parser().print_help()
        return 0

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    if args.distributed:
        from .parallel.distributed import initialize_from_env

        if initialize_from_env():
            print(
                f"Distributed: process {jax.process_index()}/"
                f"{jax.process_count()}, {len(jax.local_devices())} local / "
                f"{len(jax.devices())} global devices"
            )
        else:
            print("Distributed: no cluster detected, single-process run")

    _enable_compilation_cache()

    from .config import TrainConfig
    from .data.dataset import input_data_from_x
    from .io import load_checkpoint, load_ply, save_checkpoint, save_scene
    from .models.gaussians import init_model
    from .ops.ssim import main_loss
    from .train import Trainer, get_downscale_factor

    print(f"Using {jax.default_backend().upper()}")
    # loss print cadence: every 10 steps on an accelerator, every step on
    # CPU (opensplat.cpp:102-113)
    display_step = 10 if jax.default_backend() != "cpu" else 1

    cfg = TrainConfig(
        input=project_root,
        output=args.output,
        save_every=args.save_every,
        resume=args.resume,
        val=args.val,
        val_image=args.val_image,
        val_render=args.val_render,
        keep_crs=args.keep_crs,
        cpu=args.cpu,
        num_iters=args.num_iters,
        downscale_factor=max(args.downscale_factor, 1.0),
        num_downscales=args.num_downscales,
        resolution_schedule=args.resolution_schedule,
        sh_degree=args.sh_degree,
        sh_degree_interval=args.sh_degree_interval,
        ssim_weight=args.ssim_weight,
        refine_every=args.refine_every,
        warmup_length=args.warmup_length,
        reset_alpha_every=args.reset_alpha_every,
        densify_grad_thresh=args.densify_grad_thresh,
        densify_size_thresh=args.densify_size_thresh,
        stop_screen_size_at=args.stop_screen_size_at,
        split_screen_size=args.split_screen_size,
        colmap_image_path=args.colmap_image_path,
        capacity=args.capacity,
        renderer=args.renderer,
        checkpoint_every=args.checkpoint_every,
        ckpt_dir=args.ckpt_dir,
        gt_cache_mb=args.gt_cache_mb,
    )

    out_dir = os.path.dirname(cfg.output)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    input_data = input_data_from_x(project_root, cfg.colmap_image_path)

    with ThreadPoolExecutor() as ex:  # parallel image load (opensplat.cpp:124)
        list(ex.map(lambda c: c.load_image(cfg.downscale_factor),
                    input_data.cameras))

    validate = cfg.val or bool(cfg.val_render)
    cams, val_cam = input_data.get_cameras(validate, cfg.val_image)
    if cfg.val_render and not os.path.exists(cfg.val_render):
        os.makedirs(cfg.val_render, exist_ok=True)

    resume_path = cfg.resume
    if not resume_path and args.auto_resume and cfg.ckpt_dir:
        import glob
        import re

        ckpts = glob.glob(os.path.join(cfg.ckpt_dir, "ckpt_*.npz"))
        if ckpts:
            resume_path = max(
                ckpts,
                key=lambda p: int(re.search(r"ckpt_(\d+)\.npz$", p).group(1)),
            )
    start_step = 1
    resume_draws = -1
    if resume_path:
        if resume_path.endswith(".npz"):
            state, step0, resume_draws = load_checkpoint(resume_path)
        else:
            state, step0 = load_ply(
                resume_path,
                keep_crs=cfg.keep_crs,
                scale=input_data.scale,
                translation=input_data.translation,
                capacity=cfg.capacity,
            )
        start_step = step0 + 1
        print(f"Resuming from {resume_path} at step {start_step}")
    else:
        state = init_model(
            input_data.points_xyz,
            input_data.points_rgb,
            sh_degree=cfg.sh_degree,
            capacity=cfg.capacity,
            capacity_mult=cfg.capacity_mult,
            capacity_round=cfg.capacity_round,
            seed=cfg.seed,
        )

    renderer = pick_renderer(cfg.renderer)
    if args.data_parallel and args.model_parallel:
        # hybrid: camera-DP x Gaussian-MP on a 2D (data, model) mesh —
        # throughput scales with D while parameter memory scales 1/M
        from .parallel.gaussian_shard import GSTrainer

        n_devices = len(jax.devices())
        n_data = args.data_parallel if args.data_parallel > 0 else 2
        n_model = args.model_parallel if args.model_parallel > 0 else 2
        if n_data * n_model > n_devices:
            raise SystemExit(
                f"--data-parallel {n_data} x --model-parallel {n_model} "
                f"needs {n_data * n_model} devices, have {n_devices}"
            )
        print(
            f"Hybrid training: {n_data}-camera DP x {n_model}-shard "
            f"Gaussian MP ({n_data * n_model} devices)"
        )
        trainer = GSTrainer(state, cams, cfg, renderer=renderer,
                            n_model=n_model, n_data=n_data)
    elif args.data_parallel:
        from .parallel.dp_trainer import DPTrainer

        n_data = args.data_parallel
        if n_data < 0:
            n_data = len(jax.devices())
        n_data = min(n_data, len(jax.devices()))
        mesh = None
        if jax.process_count() > 1:
            # host-major data axis so the gradient psum pre-reduces over
            # ICI before crossing DCN once (parallel/distributed.py)
            from .parallel.distributed import global_dp_mesh

            mesh = global_dp_mesh()
            n_data = mesh.shape["data"]
        print(f"Camera data-parallel training over {n_data} devices")
        trainer = DPTrainer(state, cams, cfg, renderer=renderer,
                            mesh=mesh, n_data=n_data)
    elif args.model_parallel:
        from .parallel.gaussian_shard import GSTrainer

        n_model = args.model_parallel
        if n_model < 0:
            n_model = len(jax.devices())
        n_model = min(n_model, len(jax.devices()))
        print(f"Gaussian model-parallel training over {n_model} devices")
        trainer = GSTrainer(state, cams, cfg, renderer=renderer,
                            n_model=n_model)
    else:
        trainer = Trainer(state, cams, cfg, renderer=renderer)

    if resume_path:
        # replay the camera sampler to the crash point so the resumed
        # trajectory continues the uninterrupted run's camera order
        # exactly; PLY/legacy checkpoints (no recorded position) fall
        # back to steps-times-batch, exact for uniform-size datasets
        ff = resume_draws if resume_draws >= 0 else (
            (start_step - 1) * trainer.d_total
        )
        trainer.sampler.fast_forward(ff)

    from .utils.metrics import MetricsLogger, profile_trace

    metrics = MetricsLogger(args.metrics_file)
    report = None
    if args.report_dir:
        from .utils.report import TrainingReport

        report = TrainingReport(args.report_dir)
        if args.serve:
            # live training view: the report rewrites during training
            # (auto-refresh page) and a stdlib HTTP server makes it
            # reachable from a browser — the headless counterpart of the
            # reference's Pangolin window (visualizer.cpp:1-179)
            import http.server
            import threading

            class _Handler(http.server.SimpleHTTPRequestHandler):
                def __init__(self, *a, **kw):
                    super().__init__(*a, directory=args.report_dir, **kw)

                def do_POST(self):
                    # pause/resume/stop buttons (report.py _CONTROLS):
                    # persist the command to control.txt; the train loop
                    # polls it at display cadence
                    if self.path != "/__control__":
                        self.send_error(404)
                        return
                    n = int(self.headers.get("Content-Length", 0))
                    cmd = self.rfile.read(n).decode()[:16].strip()
                    if cmd in ("pause", "resume", "stop"):
                        with open(os.path.join(args.report_dir,
                                               "control.txt"), "w") as f:
                            f.write(cmd)
                        self.send_response(200)
                        self.end_headers()
                    else:
                        self.send_error(400)

                def log_message(self, *a):
                    pass

            httpd = http.server.ThreadingHTTPServer(("", args.serve), _Handler)
            threading.Thread(target=httpd.serve_forever, daemon=True).start()
            print(f"Live training view: http://localhost:{args.serve}/report.html")

    def save_intermediate(step):
        stem, ext = os.path.splitext(cfg.output)
        save_scene(
            trainer.state.params, trainer.state.alive,
            f"{stem}_{step}{ext}", step,
            keep_crs=cfg.keep_crs, scale=input_data.scale,
            translation=input_data.translation,
        )
        print(f"Wrote {stem}_{step}{ext}")

    def _control_cmd():
        # pause/quit channel (visualizer.cpp:184-195 semantics, headless:
        # a control file — written by the --serve buttons or by hand)
        if not args.report_dir:
            return None
        try:
            with open(os.path.join(args.report_dir, "control.txt")) as f:
                return f.read().strip()
        except OSError:
            return None

    profiling = None
    for step in range(start_step, cfg.num_iters + 1):
        if args.profile_dir and step == start_step + 5:  # skip compile steps
            profiling = profile_trace(args.profile_dir)
            profiling.__enter__()
        outcome = trainer.run_step(step)
        h, w = trainer.last_hw
        # full metric records force a device sync; skip them in the hot
        # loop unless the user asked for a metrics file
        if args.metrics_file or step % display_step == 0:
            metrics.step(step, outcome.loss, outcome.psnr, outcome.n_alive, h, w)
        else:
            metrics.tick(h, w)
        if trainer.refine_metrics is not None:
            metrics.refine(step, trainer.refine_metrics)
            trainer.refine_metrics = None
        if args.profile_dir and step == min(start_step + 15, cfg.num_iters):
            if profiling is not None:
                profiling.__exit__(None, None, None)
                profiling = None
        if step % display_step == 0:
            pct = int(100.0 * step / cfg.num_iters)
            print(
                f"Step {step}: {outcome.loss:.6f} ({pct}%)"
                f" [{metrics.steps_per_sec():.2f} steps/s,"
                f" {outcome.n_alive} gaussians]"
            )
            if report is not None:
                report.log(step, outcome.loss, outcome.psnr, outcome.n_alive)
                snap_every = max(1, cfg.num_iters // 10)
                if val_cam is not None and (
                    step % snap_every < display_step or step == cfg.num_iters
                ):
                    rgb = np.asarray(trainer.render(val_cam, step))
                    gt = val_cam.get_image(get_downscale_factor(step, cfg))
                    report.snapshot(step, rgb, np.asarray(gt))
                if step % snap_every < display_step or step == cfg.num_iters:
                    # live 3D point-cloud view (means colored by SH0)
                    from .ops.sh import sh_to_rgb

                    alive_np = np.asarray(trainer.state.alive)
                    report.point_cloud(
                        step,
                        np.asarray(trainer.state.params.means)[alive_np],
                        np.clip(np.asarray(
                            sh_to_rgb(trainer.state.params.features_dc)
                        ), 0, 1)[alive_np],
                    )
                if args.serve or step % (display_step * 10) == 0:
                    report.write(live=True)
            cmd = _control_cmd()
            if cmd == "pause":
                import time as _time

                print("Paused (control.txt) — write 'resume' to continue")
                while _control_cmd() == "pause":
                    _time.sleep(0.5)
                cmd = _control_cmd()
                print("Resumed")
            if cmd == "stop":
                print(f"Stop requested at step {step} — saving and exiting")
                break
        if cfg.save_every > 0 and step % cfg.save_every == 0:
            save_intermediate(step)
        if cfg.checkpoint_every > 0 and step % cfg.checkpoint_every == 0:
            ckpt_dir = cfg.ckpt_dir or os.path.dirname(cfg.output) or "."
            os.makedirs(ckpt_dir, exist_ok=True)
            save_checkpoint(
                trainer.state, step,
                os.path.join(ckpt_dir, f"ckpt_{step}.npz"),
                sampler_draws=trainer.sampler.draws,
            )
        if cfg.val_render and step % 10 == 0:
            rgb = np.asarray(trainer.render(val_cam, step))
            _write_png(os.path.join(cfg.val_render, f"{step}.png"), rgb)

    if profiling is not None:
        profiling.__exit__(None, None, None)
    metrics.close()
    if report is not None:
        print(f"Wrote {report.write()}")
    cameras_json = os.path.join(os.path.dirname(cfg.output) or ".", "cameras.json")
    input_data.save_cameras(cameras_json, cfg.keep_crs)
    save_scene(
        trainer.state.params, trainer.state.alive, cfg.output, cfg.num_iters,
        keep_crs=cfg.keep_crs, scale=input_data.scale,
        translation=input_data.translation,
    )
    print(f"Wrote {cfg.output}")

    if args.oracle_check and cfg.output.endswith(".ply"):
        from .models.splat_model import DEFAULT_BACKGROUND
        from .oracle.scene_check import oracle_render_scene
        from .oracle.scene_check import psnr as np_psnr
        from .train import sh_degrees_for_step

        check_cam = val_cam if val_cam is not None else cams[0]
        ckstate, _ = load_ply(
            cfg.output, keep_crs=cfg.keep_crs, scale=input_data.scale,
            translation=input_data.translation,
        )
        factor = get_downscale_factor(cfg.num_iters, cfg)
        ours = np.asarray(trainer.render(check_cam, cfg.num_iters))
        oracle_img = oracle_render_scene(
            ckstate.params, ckstate.alive, check_cam.cam_to_world,
            check_cam.fx / factor, check_cam.fy / factor,
            check_cam.cx / factor, check_cam.cy / factor,
            ours.shape[0], ours.shape[1],
            sh_degrees_for_step(cfg.num_iters, cfg),
            np.asarray(DEFAULT_BACKGROUND, np.float32),
        )
        agree = np_psnr(ours, oracle_img)
        print(
            f"oracle-check [{check_cam.file_path}]: saved-scene oracle "
            f"render vs pipeline render PSNR {agree:.2f} dB "
            f"({'OK' if agree >= 30.0 else 'MISMATCH'})"
        )

    if val_cam is not None:
        import jax.numpy as jnp

        rgb = trainer.render(val_cam, cfg.num_iters)
        gt = val_cam.get_image(get_downscale_factor(cfg.num_iters, cfg))
        vloss = float(main_loss(rgb, jnp.asarray(gt), cfg.ssim_weight))
        print(f"{val_cam.file_path} validation loss: {vloss:.6f}")
    return 0


def _write_png(path: str, rgb):
    import numpy as np

    try:
        import cv2

        bgr = cv2.cvtColor(
            (np.clip(rgb, 0, 1) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR
        )
        cv2.imwrite(path, bgr)
    except ImportError:
        from PIL import Image

        Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(path)


if __name__ == "__main__":
    sys.exit(main())
