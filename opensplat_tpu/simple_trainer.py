"""Synthetic smoke-test trainer (reference simple_trainer.cpp:24-212).

Fits N random Gaussians to the red/blue-quadrant test image with MSE and
a single Adam — exercising projection + rasterization + autodiff without
any dataset. The whole update is one jitted XLA program (vs the
reference's per-op kernel launches).
"""
from __future__ import annotations

import argparse
import math
import os
import sys
import time


def make_gt_image(height: int, width: int):
    """White canvas, top-left red, bottom-right blue
    (simple_trainer.cpp:77-82)."""
    import numpy as np

    gt = np.ones((height, width, 3), np.float32)
    gt[: height // 2, : width // 2] = (1.0, 0.0, 0.0)
    gt[height // 2:, width // 2:] = (0.0, 0.0, 1.0)
    return gt


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="simple_trainer", description="Test program for gsplat execution"
    )
    p.add_argument("--cpu", action="store_true", help="Force CPU execution")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--points", type=int, default=100000)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--render", default="", help="Save rendered images to folder")
    p.add_argument("--renderer", default="tiled",
                   choices=["dense", "tiled", "pallas"])
    p.add_argument("--display-every", type=int, default=10)
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from .ops.projection import project_gaussians
    from .ops.rasterize import rasterize
    from .ops.rasterize_tiled import rasterize_tiled
    from .ops.pallas.integration import rasterize_pallas

    print(f"Using {jax.default_backend().upper()}")
    h, w = args.height, args.width
    if args.render and not os.path.exists(args.render):
        os.makedirs(args.render, exist_ok=True)

    gt = jnp.asarray(make_gt_image(h, w))
    fov_x = math.pi / 2.0
    focal = 0.5 * w / math.tan(0.5 * fov_x)

    key = jax.random.PRNGKey(0)
    k1, k2, k3, ku, kv, kw = jax.random.split(key, 6)
    n = args.points
    params = {
        "means": 2.0 * (jax.random.uniform(k1, (n, 3)) - 0.5),
        "scales": jax.random.uniform(k2, (n, 3)),
        "rgbs": jax.random.uniform(k3, (n, 3)),
        "opacities": jnp.ones((n, 1)),
    }
    u = jax.random.uniform(ku, (n, 1))
    v = jax.random.uniform(kv, (n, 1))
    wq = jax.random.uniform(kw, (n, 1))
    two_pi = 2.0 * jnp.pi
    params["quats"] = jnp.concatenate(
        [
            jnp.sqrt(1.0 - u) * jnp.sin(two_pi * v),
            jnp.sqrt(1.0 - u) * jnp.cos(two_pi * v),
            jnp.sqrt(u) * jnp.sin(two_pi * wq),
            jnp.sqrt(u) * jnp.cos(two_pi * wq),
        ],
        axis=-1,
    )

    # camera 8 units along +z, looking down +z (simple_trainer.cpp:130-135);
    # the reference passes viewMat as the projection matrix too.
    viewmat = jnp.eye(4).at[2, 3].set(8.0)
    background = jnp.zeros(3)
    optimizer = optax.adam(args.lr, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = optimizer.init(params)
    renderer = args.renderer

    def render(params):
        pg = project_gaussians(
            params["means"], params["scales"], 1.0, params["quats"],
            viewmat, viewmat, focal, focal, w / 2.0, h / 2.0, h, w,
        )
        colors = jax.nn.sigmoid(params["rgbs"])
        opac = jax.nn.sigmoid(params["opacities"]).reshape(-1)
        if renderer == "dense":
            img, _ = rasterize(
                pg.xys, pg.conics, colors, opac, pg.depths, pg.mask,
                background, h, w,
            )
        else:
            _raster = rasterize_pallas if renderer == "pallas" else rasterize_tiled
            img, _ = _raster(
                pg.xys, pg.conics, colors, opac, pg.depths, pg.radii,
                pg.num_tiles_hit, pg.tile_min, pg.tile_max,
                background, h, w,
            )
        return img

    @jax.jit
    def step(params, opt_state):
        def loss_fn(params):
            img = render(params)
            return jnp.mean((img - gt) ** 2), img

        (loss, img), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, img

    t0 = time.perf_counter()
    for i in range(args.iters):
        params, opt_state, loss, img = step(params, opt_state)
        if (i + 1) % args.display_every == 0 or i == 0:
            print(f"Iteration {i + 1}/{args.iters} Loss: {float(loss):.6f}")
        if args.render:
            arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
            try:
                import cv2

                cv2.imwrite(
                    os.path.join(args.render, f"{i + 1}.png"),
                    cv2.cvtColor(arr, cv2.COLOR_RGB2BGR),
                )
            except ImportError:
                from PIL import Image

                Image.fromarray(arr).save(os.path.join(args.render, f"{i + 1}.png"))
    dt = time.perf_counter() - t0
    print(f"Final loss: {float(loss):.6f} ({args.iters / dt:.2f} iters/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
