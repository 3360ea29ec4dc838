"""Native C++ point_io: build, parse parity with the numpy path, speed."""
import struct
import time

import numpy as np
import pytest

from opensplat_tpu.native.loader import get_lib


def _write_points3d(path, xyz, rgb, track_lens):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<3d", *xyz[i]))
            f.write(struct.pack("<3B", *rgb[i]))
            f.write(struct.pack("<d", 0.25))
            f.write(struct.pack("<Q", track_lens[i]))
            for j in range(track_lens[i]):
                f.write(struct.pack("<II", j, j))


@pytest.fixture(scope="module")
def lib():
    l = get_lib()
    if l is None:
        pytest.skip("no native toolchain")
    return l


def test_native_matches_numpy(lib, tmp_path, monkeypatch):
    from opensplat_tpu.data import point_io

    rng = np.random.default_rng(5)
    n = 500
    xyz = rng.standard_normal((n, 3))
    rgb = rng.integers(0, 255, (n, 3))
    tracks = rng.integers(0, 9, n).tolist()
    p = str(tmp_path / "points3D.bin")
    _write_points3d(p, xyz, rgb, tracks)

    native = point_io.read_colmap_points3d(p)
    # force the numpy fallback
    monkeypatch.setattr(point_io, "_native_colmap_points3d", lambda buf: None)
    fallback = point_io.read_colmap_points3d(p)

    np.testing.assert_array_equal(native.points, fallback.points)
    np.testing.assert_array_equal(native.colors, fallback.colors)


def test_native_rejects_truncated(lib, tmp_path):
    from opensplat_tpu.data import point_io

    p = str(tmp_path / "bad.bin")
    rng = np.random.default_rng(1)
    _write_points3d(p, rng.standard_normal((10, 3)), rng.integers(0, 255, (10, 3)),
                    [2] * 10)
    raw = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(raw[:-20])  # truncate mid-record
    with pytest.raises(RuntimeError, match="Malformed"):
        point_io.read_colmap_points3d(p)


def test_native_is_faster_at_scale(lib, tmp_path):
    from opensplat_tpu.data import point_io

    rng = np.random.default_rng(2)
    n = 100_000
    xyz = rng.standard_normal((n, 3))
    rgb = rng.integers(0, 255, (n, 3))
    tracks = rng.integers(0, 4, n).tolist()
    p = str(tmp_path / "big.bin")
    _write_points3d(p, xyz, rgb, tracks)

    t0 = time.perf_counter()
    r1 = point_io.read_colmap_points3d(p)
    native_t = time.perf_counter() - t0

    buf = open(p, "rb").read()
    t0 = time.perf_counter()
    # numpy fallback path, measured directly
    import opensplat_tpu.data.point_io as pio
    orig = pio._native_colmap_points3d
    pio._native_colmap_points3d = lambda b: None
    try:
        r2 = point_io.read_colmap_points3d(p)
    finally:
        pio._native_colmap_points3d = orig
    numpy_t = time.perf_counter() - t0

    np.testing.assert_array_equal(r1.points, r2.points)
    assert native_t < numpy_t, (native_t, numpy_t)
