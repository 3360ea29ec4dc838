"""Data layer tests: point_io round-trips + all four SfM project loaders
against hand-built synthetic fixtures (the reference ships no test data;
formats per colmap.cpp / nerfstudio.cpp / opensfm.cpp / openmvg.cpp)."""
import json
import os
import struct

import numpy as np
import pytest

from opensplat_tpu.data.dataset import input_data_from_x
from opensplat_tpu.data.point_io import (
    PointSet,
    read_colmap_points3d,
    read_ply_point_set,
    read_point_set,
    save_point_set,
)


def _write_ply(path, points, colors=None, ascii_fmt=False, extra_alpha=False):
    n = len(points)
    lines = ["ply"]
    lines.append("format ascii 1.0" if ascii_fmt else "format binary_little_endian 1.0")
    lines += [
        "comment test fixture",
        f"element vertex {n}",
        "property float x",
        "property float y",
        "property float z",
    ]
    if colors is not None:
        lines += ["property uchar red", "property uchar green", "property uchar blue"]
        if extra_alpha:
            lines.append("property uchar alpha")
    lines.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(lines) + "\n").encode())
        if ascii_fmt:
            for i in range(n):
                row = [f"{v:.6f}" for v in points[i]]
                if colors is not None:
                    row += [str(int(v)) for v in colors[i]]
                    if extra_alpha:
                        row.append("255")
                f.write((" ".join(row) + "\n").encode())
        else:
            for i in range(n):
                f.write(struct.pack("<3f", *points[i]))
                if colors is not None:
                    f.write(struct.pack("<3B", *colors[i]))
                    if extra_alpha:
                        f.write(struct.pack("<B", 255))


def _write_points3d_bin(path, xyz, rgb, track_lens):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<3d", *xyz[i]))
            f.write(struct.pack("<3B", *rgb[i]))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", track_lens[i]))
            for j in range(track_lens[i]):
                f.write(struct.pack("<II", j, j))


def _write_cameras_bin(path):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 2))
        # camera 1: PINHOLE
        f.write(struct.pack("<Ii", 1, 1))
        f.write(struct.pack("<QQ", 640, 480))
        f.write(struct.pack("<4d", 500.0, 510.0, 320.0, 240.0))
        # camera 2: OPENCV
        f.write(struct.pack("<Ii", 2, 4))
        f.write(struct.pack("<QQ", 800, 600))
        f.write(struct.pack("<8d", 600.0, 610.0, 400.0, 300.0, 0.01, -0.02, 0.001, 0.002))


def _write_images_bin(path, images):
    """images: list of (qvec wxyz, tvec, cam_id, name)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for i, (q, t, cid, name) in enumerate(images):
            f.write(struct.pack("<I", i + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<I", cid))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 2))
            for _ in range(2):
                f.write(struct.pack("<ddQ", 1.0, 2.0, 3))


def test_ply_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((17, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (17, 3)).astype(np.uint8)
    p = str(tmp_path / "a.ply")
    save_point_set(PointSet(points=pts, colors=cols), p)
    r = read_ply_point_set(p)
    np.testing.assert_array_equal(r.points, pts)
    np.testing.assert_array_equal(r.colors, cols)


def test_ply_ascii_and_extra_props(tmp_path):
    pts = np.array([[1, 2, 3], [4, 5, 6]], np.float32)
    cols = np.array([[10, 20, 30], [40, 50, 60]], np.uint8)
    pa = str(tmp_path / "ascii.ply")
    _write_ply(pa, pts, cols, ascii_fmt=True)
    r = read_ply_point_set(pa)
    np.testing.assert_allclose(r.points, pts, atol=1e-5)
    np.testing.assert_array_equal(r.colors, cols)
    # binary with an extra (ignored) alpha property
    pb = str(tmp_path / "alpha.ply")
    _write_ply(pb, pts, cols, extra_alpha=True)
    r = read_ply_point_set(pb)
    np.testing.assert_array_equal(r.colors, cols)


def test_colmap_points3d_variable_tracks(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.standard_normal((9, 3))
    rgb = rng.integers(0, 255, (9, 3))
    tracks = [0, 3, 1, 7, 2, 0, 5, 1, 4]
    p = str(tmp_path / "points3D.bin")
    _write_points3d_bin(p, xyz, rgb, tracks)
    r = read_colmap_points3d(p)
    np.testing.assert_allclose(r.points, xyz.astype(np.float32), rtol=1e-6)
    np.testing.assert_array_equal(r.colors, rgb.astype(np.uint8))


@pytest.fixture
def colmap_project(tmp_path):
    root = tmp_path / "proj"
    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True)
    _write_cameras_bin(str(sparse / "cameras.bin"))
    # two images with distinct rotations/translations
    q1 = np.array([1.0, 0.0, 0.0, 0.0])
    q2 = np.array([np.cos(np.pi / 8), 0.0, np.sin(np.pi / 8), 0.0])
    _write_images_bin(
        str(sparse / "images.bin"),
        [(q1, np.array([0.5, -0.2, 2.0]), 1, "img_001.png"),
         (q2, np.array([-1.0, 0.3, 1.5]), 2, "img_002.png")],
    )
    rng = np.random.default_rng(2)
    xyz = rng.standard_normal((20, 3))
    rgb = rng.integers(0, 255, (20, 3))
    _write_points3d_bin(str(sparse / "points3D.bin"), xyz, rgb, [0] * 20)
    return str(root), xyz, rgb


def test_colmap_loader(colmap_project):
    root, xyz, rgb = colmap_project
    data = input_data_from_x(root)
    assert len(data.cameras) == 2
    c0, c1 = data.cameras
    assert (c0.fx, c0.fy, c0.cx, c0.cy) == (500.0, 510.0, 320.0, 240.0)
    assert c1.k1 == 0.01 and c1.p2 == 0.002
    assert c0.file_path.endswith(os.path.join("images", "img_001.png"))
    # poses: orthonormal rotation block, normalized origins
    for c in data.cameras:
        R = c.cam_to_world[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    origins = np.stack([c.cam_to_world[:3, 3] for c in data.cameras])
    assert np.abs(origins).max() == pytest.approx(1.0, rel=1e-5)
    # identity-quaternion camera: y,z columns flipped vs identity
    np.testing.assert_allclose(
        data.cameras[0].cam_to_world[:3, :3],
        np.diag([1.0, -1.0, -1.0]),
        atol=1e-6,
    )
    # points transformed by the same CRS
    expected = (xyz.astype(np.float32) - data.translation) * np.float32(data.scale)
    np.testing.assert_allclose(data.points_xyz, expected, rtol=1e-5)
    np.testing.assert_array_equal(data.points_rgb, rgb.astype(np.uint8))


def test_nerfstudio_loader(tmp_path):
    root = tmp_path / "ns"
    root.mkdir()
    pts = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, -0.5, 2.0]], np.float32)
    cols = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    _write_ply(str(root / "sparse.ply"), pts, cols)
    m1 = np.eye(4).tolist()
    m2 = np.diag([1.0, 1.0, 1.0, 1.0])
    m2[:3, 3] = [2.0, 0.0, 1.0]
    transforms = {
        "camera_model": "OPENCV",
        "w": 100, "h": 80, "fl_x": 90.0, "fl_y": 91.0, "cx": 50.0, "cy": 40.0,
        "k1": 0.01,
        "ply_file_path": "sparse.ply",
        "frames": [
            # out of sorted order on purpose; second frame overrides fl_x
            {"file_path": "images/b.png", "transform_matrix": m2.tolist(),
             "fl_x": 95.0},
            {"file_path": "images/a.png", "transform_matrix": m1},
        ],
    }
    with open(root / "transforms.json", "w") as f:
        json.dump(transforms, f)
    data = input_data_from_x(str(root))
    assert [os.path.basename(c.file_path) for c in data.cameras] == ["a.png", "b.png"]
    assert data.cameras[0].fx == 90.0  # global backfill
    assert data.cameras[1].fx == 95.0  # per-frame wins
    assert data.cameras[0].width == 100 and data.cameras[0].k1 == 0.01
    np.testing.assert_array_equal(data.points_rgb, cols)
    expected = (pts - data.translation) * np.float32(data.scale)
    np.testing.assert_allclose(data.points_xyz, expected, rtol=1e-5)


def test_opensfm_loader(tmp_path):
    root = tmp_path / "osfm"
    root.mkdir()
    rec = [{
        "cameras": {
            "cam0": {
                "projection_type": "perspective",
                "width": 200, "height": 100,
                "focal": 0.8, "k1": -0.05, "k2": 0.01,
            }
        },
        "shots": {
            "shot_a.jpg": {
                "camera": "cam0",
                "rotation": [0.0, 0.0, 0.0],
                "translation": [0.0, 0.0, 4.0],
            },
            "shot_b.jpg": {
                "camera": "cam0",
                "rotation": [0.0, 0.3, 0.0],
                "translation": [1.0, 0.0, 3.0],
            },
        },
        "points": {
            "1": {"coordinates": [0.0, 1.0, 2.0], "color": [255, 128, 0]},
            "2": {"coordinates": [1.0, -1.0, 3.0], "color": [0, 128, 255]},
        },
    }]
    with open(root / "reconstruction.json", "w") as f:
        json.dump(rec, f)
    with open(root / "image_list.txt", "w") as f:
        f.write("images/shot_a.jpg\nimages/shot_b.jpg\n")
    data = input_data_from_x(str(root))
    assert len(data.cameras) == 2
    cam = data.cameras[0]
    # normalizer = max(200,100) = 200
    assert cam.fx == pytest.approx(0.8 * 200)
    assert cam.cx == pytest.approx(100.0)  # w/2 + 200*0 = 100
    assert cam.k1 == pytest.approx(-0.05)
    assert cam.file_path.endswith(os.path.join("images", "shot_a.jpg"))
    # identity-rodrigues shot at t=(0,0,4): c2w origin pre-normalization is
    # (0,0,-4); both origins normalized to max-abs 1
    origins = np.stack([c.cam_to_world[:3, 3] for c in data.cameras])
    assert np.abs(origins).max() == pytest.approx(1.0, rel=1e-5)
    assert data.points_xyz.shape == (2, 3)
    np.testing.assert_array_equal(data.points_rgb[0], [255, 128, 0])


def test_openmvg_loader(tmp_path):
    root = tmp_path / "omvg"
    root.mkdir()
    pts = np.array([[0.0, 0.0, 1.0], [1.0, 2.0, 3.0]], np.float32)
    cols = np.array([[9, 8, 7], [1, 2, 3]], np.uint8)
    _write_ply(str(root / "colorized.ply"), pts, cols)
    R_json = np.eye(3).tolist()  # column-major identity == row-major identity
    sfm = {
        "root_path": "/data/images",
        "intrinsics": [{
            "key": 0,
            "value": {
                "polymorphic_name": "pinhole_brown_t2",
                "ptr_wrapper": {"data": {
                    "width": 400, "height": 300,
                    "focal_length": 350.0,
                    "principal_point": [200.0, 150.0],
                    "disto_t2": [0.1, 0.01, 0.001, 0.0001, 0.00001],
                }},
            },
        }],
        "views": [{
            "key": 0,
            "value": {"ptr_wrapper": {"data": {
                "filename": "v0.jpg", "width": 400, "height": 300,
                "id_view": 0, "id_intrinsic": 0, "id_pose": 0,
            }}},
        }, {
            "key": 1,
            "value": {"ptr_wrapper": {"data": {
                "filename": "v1.jpg", "width": 400, "height": 300,
                "id_view": 1, "id_intrinsic": 0, "id_pose": 1,
            }}},
        }],
        "extrinsics": [
            {"key": 0, "value": {"rotation": R_json, "center": [0.0, 0.0, 5.0]}},
            {"key": 1, "value": {"rotation": R_json, "center": [2.0, 1.0, 4.0]}},
        ],
    }
    with open(root / "sfm_data.json", "w") as f:
        json.dump(sfm, f)
    data = input_data_from_x(str(root))
    assert len(data.cameras) == 2
    cam = data.cameras[0]
    norm = 400.0
    assert cam.fx == pytest.approx(350.0 * norm)
    # mirrors the reference formula exactly (openmvg.cpp:331)
    assert cam.cx == pytest.approx(400 / 2.0 + norm * 200.0)
    assert cam.k1 == pytest.approx(0.1) and cam.p2 == pytest.approx(0.00001)
    assert cam.file_path == os.path.join("/data/images", "v0.jpg")
    np.testing.assert_array_equal(data.points_rgb, cols)


def test_dispatch_errors(tmp_path):
    with pytest.raises(RuntimeError, match="Invalid project folder"):
        input_data_from_x(str(tmp_path))


def test_camera_load_image_undistort(tmp_path):
    """load_image: rescale intrinsics to actual dims, undistort with ROI
    crop, update K (input_data.cpp:104-152 semantics)."""
    import cv2

    from opensplat_tpu.data.dataset import Camera

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
    p = str(tmp_path / "img.png")
    cv2.imwrite(p, img)

    cam = Camera(width=320, height=240, fx=300.0, fy=300.0, cx=160.0,
                 cy=120.0, k1=-0.2, k2=0.05, file_path=p)
    cam.load_image()
    # intrinsics rescaled by actual/declared = 0.5, then modified by
    # getOptimalNewCameraMatrix
    assert cam.image is not None
    assert cam.image.dtype == np.float32
    assert 0.0 <= cam.image.min() and cam.image.max() <= 1.0
    # ROI crop shrinks or keeps dims; intrinsics consistent with new dims
    assert cam.height == cam.image.shape[0]
    assert cam.width == cam.image.shape[1]
    assert cam.fx != 300.0  # rescaled + optimal-matrix adjusted
    # second call must fail (destructive-once, like the reference cache)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        cam.load_image()


def test_camera_pyramid_cache(tmp_path):
    from opensplat_tpu.data.dataset import Camera

    cam = Camera(width=64, height=48, fx=50, fy=50, cx=32, cy=24)
    rng = np.random.default_rng(1)
    cam.set_image(rng.uniform(0, 1, (48, 64, 3)).astype(np.float32))
    half = cam.get_image(2)
    assert half.shape == (24, 32, 3)
    assert cam.get_image(2) is half  # cached
    assert cam.get_image(1).shape == (48, 64, 3)


def _write_las(path, pts, rgb=None, fmt=None, version=(1, 2)):
    """Minimal LAS writer for tests (spec-conformant header, formats 0/2/7)."""
    if fmt is None:
        fmt = 0 if rgb is None else 2
    rec_len = {0: 20, 2: 26, 3: 34, 7: 36}[fmt]
    rgb_off = {2: 20, 3: 28, 7: 30}.get(fmt)
    n = pts.shape[0]
    scale = np.array([0.001, 0.001, 0.001])
    offset = pts.min(axis=0)
    hdr_size = 227 if version < (1, 4) else 375
    header = bytearray(hdr_size)
    header[0:4] = b"LASF"
    header[24] = version[0]
    header[25] = version[1]
    header[94:96] = np.uint16(hdr_size).tobytes()  # header size
    header[96:100] = np.uint32(hdr_size).tobytes()  # point data offset
    header[104] = fmt
    header[105:107] = np.uint16(rec_len).tobytes()
    if version < (1, 4):
        header[107:111] = np.uint32(n).tobytes()
    else:
        header[247:255] = np.uint64(n).tobytes()
    header[131:155] = scale.astype("<f8").tobytes()
    header[155:179] = offset.astype("<f8").tobytes()
    recs = np.zeros((n, rec_len), np.uint8)
    xyz_i = np.round((pts - offset) / scale).astype("<i4")
    recs[:, 0:12] = xyz_i.view(np.uint8).reshape(n, 12)
    if rgb is not None and rgb_off is not None:
        rgb16 = (rgb.astype(np.uint32) * 65535 // 255).astype("<u2")
        recs[:, rgb_off:rgb_off + 6] = rgb16.view(np.uint8).reshape(n, 6)
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(recs.tobytes())


def test_las_reader_numpy(tmp_path):
    """Uncompressed LAS reads without laspy (reference's optional PDAL
    path, point_io.cpp:264-359): XYZ descaling + 16-bit RGB."""
    rng = np.random.default_rng(11)
    pts = rng.uniform(-50, 50, (200, 3)).astype(np.float64)
    rgb = rng.integers(0, 256, (200, 3)).astype(np.uint8)

    # format 2 (RGB), LAS 1.2
    p = str(tmp_path / "cloud.las")
    _write_las(p, pts, rgb, fmt=2)
    ps = read_point_set(p)
    assert ps.count() == 200
    np.testing.assert_allclose(ps.points, pts.astype(np.float32), atol=2e-3)
    np.testing.assert_array_equal(ps.colors, rgb)

    # format 0 (no color), LAS 1.4 extended count
    p0 = str(tmp_path / "nocolor.las")
    _write_las(p0, pts, None, fmt=0, version=(1, 4))
    ps0 = read_point_set(p0)
    assert ps0.count() == 200 and ps0.colors is None
    np.testing.assert_allclose(ps0.points, pts.astype(np.float32), atol=2e-3)

    # format 7 (LAS 1.4 new-style RGB at offset 30)
    p7 = str(tmp_path / "f7.las")
    _write_las(p7, pts, rgb, fmt=7, version=(1, 4))
    ps7 = read_point_set(p7)
    np.testing.assert_array_equal(ps7.colors, rgb)

    # LAZ without laspy: clear actionable error
    import shutil
    pz = str(tmp_path / "cloud.laz")
    shutil.copy(p, pz)
    try:
        import laspy  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="laspy"):
            read_point_set(pz)


def test_las_writer_roundtrip(tmp_path):
    """save_point_set('.las') mirrors the reference's PDAL write branch
    (point_io.cpp:411-459): LAS 1.2 format-2 records round-trip XYZ
    (int32 quantization over the extent) and exact 8-bit RGB."""
    from opensplat_tpu.data.point_io import PointSet, save_point_set

    rng = np.random.default_rng(12)
    pts = rng.uniform(-80, 80, (300, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (300, 3)).astype(np.uint8)

    p = str(tmp_path / "out.las")
    save_point_set(PointSet(points=pts, colors=rgb), p)
    ps = read_point_set(p)
    assert ps.count() == 300
    np.testing.assert_allclose(ps.points, pts, atol=1e-4)
    np.testing.assert_array_equal(ps.colors, rgb)

    # colorless cloud still reads (RGB fields zero but present in fmt 2)
    p2 = str(tmp_path / "nocolor.las")
    save_point_set(PointSet(points=pts), p2)
    ps2 = read_point_set(p2)
    np.testing.assert_allclose(ps2.points, pts, atol=1e-4)

    # .laz on write: laspy roundtrip when installed, else a clear
    # actionable error, like the reference's PDAL-gated path. Probe
    # availability FIRST so an ImportError raised inside the roundtrip
    # can never divert into the error-branch assertion.
    import importlib.util

    pz = str(tmp_path / "x.laz")
    if importlib.util.find_spec("laspy") is not None:
        try:
            save_point_set(PointSet(points=pts, colors=rgb), pz)
        except RuntimeError as e:
            # laspy installed without a LAZ backend (lazrs/laszip):
            # the writer must still raise the actionable message
            assert "lazrs" in str(e) or "LAZ" in str(e)
        else:
            psz = read_point_set(pz)
            np.testing.assert_allclose(psz.points, pts, atol=1e-4)
            np.testing.assert_array_equal(psz.colors, rgb)
    else:
        with pytest.raises(RuntimeError, match="LAZ"):
            save_point_set(PointSet(points=pts), pz)

    # unknown extensions error like the reference's savePointSet
    # (point_io.cpp:411-414) instead of silently writing PLY bytes
    with pytest.raises(RuntimeError, match="[Uu]nsupported"):
        save_point_set(PointSet(points=pts), str(tmp_path / "x.xyz"))

    # LAS format 2 cannot carry normals/views: warn, don't drop silently
    with pytest.warns(UserWarning, match="normals"):
        save_point_set(
            PointSet(points=pts, normals=pts.copy()),
            str(tmp_path / "n.las"),
        )
