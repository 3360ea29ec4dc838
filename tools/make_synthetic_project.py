"""Generate a synthetic nerfstudio-format project for end-to-end runs.

Renders ground-truth images of a procedurally built Gaussian scene from
cameras on a ring, and writes transforms.json + sparse.ply + images/ so
the CLI can train on it without any external dataset (none can be
downloaded in this environment). Usage:

    python tools/make_synthetic_project.py /tmp/scene --cams 24 --points 2000 --res 256
"""
from __future__ import annotations

import argparse
import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def look_at(eye, target=np.zeros(3), up=np.array([0.0, 1.0, 0.0])):
    f = target - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = r, u, -f
    c2w[:3, 3] = eye
    return c2w


def write_ply(path, points, colors):
    n = len(points)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    ).encode()
    with open(path, "wb") as f:
        f.write(header)
        for i in range(n):
            f.write(struct.pack("<3f", *points[i]))
            f.write(struct.pack("<3B", *colors[i]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--cams", type=int, default=16)
    ap.add_argument("--points", type=int, default=1500)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--sparse-frac", type=float, default=0.5,
                    help="fraction of true points revealed in sparse.ply "
                    "(forces densification to recover the rest)")
    ap.add_argument("--tpu", action="store_true",
                    help="render GT on the accelerator (default: CPU — "
                    "project generation should never claim the TPU)")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import cv2
    import jax
    import jax.numpy as jnp

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from opensplat_tpu.models.gaussians import GaussianParams
    from opensplat_tpu.models.splat_model import render_forward
    from opensplat_tpu.ops.sh import rgb_to_sh

    rng = np.random.default_rng(args.seed)
    n = args.points
    h = w = args.res
    fx = fy = 1.1 * args.res

    # clustered blobs look more like a real object than uniform noise
    centers = rng.uniform(-0.8, 0.8, (8, 3))
    assign = rng.integers(0, len(centers), n)
    pts = (centers[assign] + rng.normal(0, 0.25, (n, 3))).astype(np.float32)
    cols = rng.integers(20, 235, (n, 3)).astype(np.uint8)

    params = GaussianParams(
        means=jnp.asarray(pts),
        scales=jnp.full((n, 3), np.log(0.06), jnp.float32),
        quats=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1)),
        features_dc=jnp.asarray(
            np.asarray(rgb_to_sh(cols.astype(np.float32) / 255.0), np.float32)
        ),
        features_rest=jnp.zeros((n, 0, 3), jnp.float32),
        opacities=jnp.full((n, 1), 2.5, jnp.float32),
    )
    alive = jnp.ones((n,), bool)

    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)
    frames = []
    for i in range(args.cams):
        ang = 2 * np.pi * i / args.cams
        elev = 0.4 + 0.8 * ((i * 7919) % args.cams) / args.cams
        eye = np.array(
            [4.0 * np.cos(ang), elev, 4.0 * np.sin(ang)], np.float32
        )
        c2w = look_at(eye)
        out = render_forward(
            params, alive, jnp.asarray(c2w), fx, fy, w / 2.0, h / 2.0,
            h, w, 0, jnp.asarray([0.0, 0.0, 0.0]), renderer="dense",
        )
        img = (np.clip(np.asarray(out.rgb), 0, 1) * 255).astype(np.uint8)
        fname = f"images/r_{i:03d}.png"
        cv2.imwrite(os.path.join(args.out, fname),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        frames.append({"file_path": fname, "transform_matrix": c2w.tolist()})
        print(f"rendered {fname}")

    keep = rng.random(n) < args.sparse_frac
    write_ply(os.path.join(args.out, "sparse.ply"), pts[keep], cols[keep])
    with open(os.path.join(args.out, "transforms.json"), "w") as f:
        json.dump(
            {
                "camera_model": "OPENCV",
                "w": w, "h": h, "fl_x": fx, "fl_y": fy,
                "cx": w / 2.0, "cy": h / 2.0,
                "ply_file_path": "sparse.ply",
                "frames": frames,
            },
            f,
        )
    print(f"wrote {args.out} ({args.cams} cams, {int(keep.sum())} sparse pts)")


if __name__ == "__main__":
    main()
