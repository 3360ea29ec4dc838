"""Headless training report — the TPU-native stand-in for the reference's
optional Pangolin visualizer (visualizer.{hpp,cpp}, -DUSE_VISUALIZATION):
loss/PSNR/population curves + render-vs-GT snapshots, written as a
self-contained HTML file. TPU pods are headless; a file-based report
replaces the interactive window.
"""
from __future__ import annotations

import base64
import html
import os
from typing import List, Optional

import numpy as np


def _svg_curve(xs, ys, title, width=640, height=180, color="#2563eb"):
    if len(xs) < 2:
        return f"<p>{html.escape(title)}: not enough data</p>"
    x0, x1 = min(xs), max(xs)
    finite = [y for y in ys if np.isfinite(y)]
    if not finite:
        return f"<p>{html.escape(title)}: no finite data</p>"
    y0, y1 = min(finite), max(finite)
    if y1 == y0:
        y1 = y0 + 1.0
    pts = []
    for x, y in zip(xs, ys):
        if not np.isfinite(y):
            continue
        px = 40 + (x - x0) / (x1 - x0) * (width - 50)
        py = height - 20 - (y - y0) / (y1 - y0) * (height - 40)
        pts.append(f"{px:.1f},{py:.1f}")
    return (
        f'<h3>{html.escape(title)}</h3>'
        f'<svg width="{width}" height="{height}" '
        f'style="background:#f8fafc;border:1px solid #e2e8f0">'
        f'<text x="4" y="14" font-size="11">{y1:.4g}</text>'
        f'<text x="4" y="{height - 6}" font-size="11">{y0:.4g}</text>'
        f'<text x="{width - 60}" y="{height - 6}" font-size="11">step {x1}</text>'
        f'<polyline fill="none" stroke="{color}" stroke-width="1.5" '
        f'points="{" ".join(pts)}"/></svg>'
    )


def _png_b64(img: np.ndarray) -> str:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
        buf, format="PNG"
    )
    return base64.b64encode(buf.getvalue()).decode()


class TrainingReport:
    """Accumulates curves + snapshots; write() emits one HTML file."""

    def __init__(self, out_dir: str, max_snapshots: int = 12):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.steps: List[int] = []
        self.losses: List[float] = []
        self.psnrs: List[float] = []
        self.counts: List[int] = []
        self.snapshots: List[dict] = []
        self.max_snapshots = max_snapshots

    def log(self, step: int, loss: float, psnr: float, n_gaussians: int):
        self.steps.append(step)
        self.losses.append(float(loss))
        self.psnrs.append(float(psnr))
        self.counts.append(int(n_gaussians))

    def snapshot(self, step: int, render: np.ndarray,
                 gt: Optional[np.ndarray] = None):
        if len(self.snapshots) >= self.max_snapshots:
            # keep first/last-heavy coverage: drop the middle entry
            self.snapshots.pop(len(self.snapshots) // 2)
        self.snapshots.append(
            {"step": step, "render": _png_b64(render),
             "gt": _png_b64(gt) if gt is not None else None}
        )

    def write(self, filename: str = "report.html", live: bool = False) -> str:
        """live=True adds an auto-refresh tag: rewritten every few dozen
        steps by the CLI (and optionally served via --serve), the page
        becomes a during-training view — the headless upgrade of the
        reference's interactive visualizer window (visualizer.cpp)."""
        parts = [
            "<!doctype html><meta charset='utf-8'>",
            "<meta http-equiv='refresh' content='5'>" if live else "",
            "<title>opensplat_tpu training report</title>",
            "<body style='font-family:system-ui;max-width:720px;margin:2em auto'>",
            "<h1>Training report</h1>" + (
                " <p><i>live — refreshes every 5 s</i></p>" if live else ""
            ),
        ]
        if self.steps:
            parts.append(
                f"<p>{self.steps[-1]} steps · final loss "
                f"{self.losses[-1]:.5f} · final PSNR {self.psnrs[-1]:.2f} dB "
                f"· {self.counts[-1]} gaussians</p>"
            )
            parts.append(_svg_curve(self.steps, self.losses, "Loss"))
            parts.append(_svg_curve(self.steps, self.psnrs, "PSNR (dB)",
                                    color="#16a34a"))
            parts.append(_svg_curve(self.steps, self.counts, "Gaussians",
                                    color="#9333ea"))
        if self.snapshots:
            parts.append("<h3>Render vs ground truth</h3>")
            for s in self.snapshots:
                parts.append(f"<div><b>step {s['step']}</b><br>")
                parts.append(
                    f'<img src="data:image/png;base64,{s["render"]}" '
                    f'style="max-width:320px">'
                )
                if s["gt"]:
                    parts.append(
                        f'<img src="data:image/png;base64,{s["gt"]}" '
                        f'style="max-width:320px">'
                    )
                parts.append("</div>")
        parts.append("</body>")
        path = os.path.join(self.out_dir, filename)
        with open(path, "w") as f:
            f.write("\n".join(parts))
        return path
