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
    ap.add_argument("--style", choices=["blobs", "textured"],
                    default="blobs",
                    help="textured = multi-object procedural-texture scene "
                    "(quality-proxy runs); GT renders through the tiled "
                    "renderer so large point counts / resolutions work")
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

    if args.style == "textured":
        # multi-object scene with procedural texture: a ground patch,
        # several ellipsoid "objects" and a torus, each with a palette
        # base color modulated by high-frequency positional texture —
        # the banana-shaped quality proxy (VERDICT r4 item 5): surfaces,
        # silhouettes and texture the densifier must actually resolve
        parts = []
        n_ground = n // 4
        gx = rng.uniform(-1.6, 1.6, (n_ground, 1))
        gz = rng.uniform(-1.6, 1.6, (n_ground, 1))
        gy = (-0.75 + 0.08 * np.sin(3.0 * gx) * np.cos(2.5 * gz)
              + rng.normal(0, 0.01, (n_ground, 1)))
        parts.append(np.concatenate([gx, gy, gz], axis=1))
        n_obj = n - n_ground
        n_each = n_obj // 6
        obj_centers = np.array(
            [[-0.7, -0.3, -0.5], [0.6, -0.25, -0.6], [0.0, -0.2, 0.55],
             [-0.55, 0.15, 0.5], [0.65, 0.25, 0.35], [0.0, 0.45, -0.3]]
        )
        obj_radii = np.array(
            [[0.35, 0.4, 0.3], [0.3, 0.28, 0.42], [0.45, 0.2, 0.3],
             [0.25, 0.33, 0.25], [0.2, 0.2, 0.2], [0.3, 0.12, 0.3]]
        )
        for k in range(6):
            m = n_each if k < 5 else n_obj - 5 * n_each
            if k == 5:  # torus
                u = rng.uniform(0, 2 * np.pi, m)
                v = rng.uniform(0, 2 * np.pi, m)
                r_maj, r_min = 0.28, 0.09
                px = (r_maj + r_min * np.cos(v)) * np.cos(u)
                py = r_min * np.sin(v)
                pz = (r_maj + r_min * np.cos(u * 0)) * 0 + (
                    r_maj + r_min * np.cos(v)
                ) * np.sin(u)
                p = np.stack([px, py, pz], axis=1) + obj_centers[k]
            else:  # ellipsoid SURFACE (not solid): silhouettes + occlusion
                d = rng.normal(size=(m, 3))
                d /= np.linalg.norm(d, axis=1, keepdims=True)
                p = obj_centers[k] + d * obj_radii[k] * (
                    1.0 + rng.normal(0, 0.02, (m, 1))
                )
            parts.append(p)
        pts = np.concatenate(parts).astype(np.float32)

        # procedural texture: palette base + banded/high-freq modulation
        palette = np.array(
            [[205, 180, 140], [190, 60, 50], [60, 150, 200], [240, 200, 60],
             [90, 180, 90], [170, 90, 190], [230, 130, 40]], np.float64
        )
        seg = np.concatenate(
            [np.zeros(n_ground, np.int64)]
            + [np.full(len(parts[1 + k]), 1 + k, np.int64) for k in range(6)]
        )
        base = palette[seg]
        tex = (
            0.5 * np.sin(14.0 * pts[:, 0:1] + 9.0 * pts[:, 2:3])
            + 0.3 * np.cos(23.0 * pts[:, 1:2] + 7.0 * pts[:, 0:1])
            + 0.2 * np.sin(31.0 * pts[:, 2:3])
        )
        cols = np.clip(
            base * (0.75 + 0.25 * tex) + rng.normal(0, 6.0, (n, 3)), 5, 250
        ).astype(np.uint8)

        # anisotropic, randomly oriented splats sized to local density
        from scipy.spatial import cKDTree

        dist, _ = cKDTree(pts).query(pts, k=4)
        s_iso = np.maximum(dist[:, 1:].mean(axis=1), 1e-4)
        s = np.stack(
            [s_iso * rng.uniform(0.7, 1.4, n),
             s_iso * rng.uniform(0.7, 1.4, n),
             s_iso * rng.uniform(0.25, 0.6, n)],  # flattened: surfels
            axis=1,
        ).astype(np.float32)
        q = rng.normal(size=(n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        scales = jnp.asarray(np.log(s))
        quats = jnp.asarray(q)
        opac = jnp.full((n, 1), 3.5, jnp.float32)  # ~0.97: near-solid
    else:
        # clustered blobs look more like a real object than uniform noise
        centers = rng.uniform(-0.8, 0.8, (8, 3))
        assign = rng.integers(0, len(centers), n)
        pts = (centers[assign] + rng.normal(0, 0.25, (n, 3))).astype(
            np.float32
        )
        cols = rng.integers(20, 235, (n, 3)).astype(np.uint8)
        scales = jnp.full((n, 3), np.log(0.06), jnp.float32)
        quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
        opac = jnp.full((n, 1), 2.5, jnp.float32)

    params = GaussianParams(
        means=jnp.asarray(pts),
        scales=scales,
        quats=quats,
        features_dc=jnp.asarray(
            np.asarray(rgb_to_sh(cols.astype(np.float32) / 255.0), np.float32)
        ),
        features_rest=jnp.zeros((n, 0, 3), jnp.float32),
        opacities=opac,
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
        # dense is O(N x pixels) — fine for small blob scenes; the
        # textured proxy (200k+ points, 1080p) renders tiled
        renderer = "dense" if args.style == "blobs" else "tiled"
        budget = 0 if renderer == "dense" else max(48 * n, 1 << 22)
        out = render_forward(
            params, alive, jnp.asarray(c2w), fx, fy, w / 2.0, h / 2.0,
            h, w, 0, jnp.asarray([0.0, 0.0, 0.0]), renderer=renderer,
            isect_budget=budget,
        )
        if renderer == "tiled":
            n_is = int(out.n_isects)
            assert n_is <= budget, (
                f"GT isect overflow: {n_is} > {budget} — raise budget"
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
