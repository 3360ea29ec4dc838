"""Training report (headless visualizer stand-in) tests."""
import numpy as np

from opensplat_tpu.utils.report import TrainingReport


def test_report_html(tmp_path):
    r = TrainingReport(str(tmp_path))
    for s in range(10, 110, 10):
        r.log(s, loss=1.0 / s, psnr=15 + s / 20, n_gaussians=100 + s)
    img = np.random.default_rng(0).uniform(0, 1, (32, 32, 3))
    r.snapshot(50, img, img * 0.5)
    r.snapshot(100, img)
    path = r.write()
    content = open(path).read()
    assert "polyline" in content  # curves rendered
    assert content.count("data:image/png;base64,") == 3  # 2 renders + 1 gt
    assert "PSNR" in content and "Gaussians" in content


def test_report_snapshot_cap(tmp_path):
    r = TrainingReport(str(tmp_path), max_snapshots=3)
    img = np.zeros((8, 8, 3))
    for s in range(6):
        r.snapshot(s, img)
    assert len(r.snapshots) == 3
    assert r.snapshots[0]["step"] == 0  # first kept
    assert r.snapshots[-1]["step"] == 5  # latest kept


def test_live_report_refreshes(tmp_path):
    """live=True emits an auto-refreshing page (the during-training view
    served by --serve; stand-in upgrade for visualizer.cpp)."""
    from opensplat_tpu.utils.report import TrainingReport

    rep = TrainingReport(str(tmp_path))
    rep.log(1, 0.5, 20.0, 100)
    rep.log(2, 0.4, 21.0, 100)
    path = rep.write(live=True)
    content = open(path).read()
    assert "http-equiv='refresh'" in content
    assert "live" in content
    static = open(rep.write()).read()
    assert "http-equiv='refresh'" not in static


def test_point_cloud_and_controls(tmp_path):
    """Live view upgrade (visualizer.cpp:1-179 parity): the 3D point
    cloud embeds as an inline canvas orbiter, and live pages carry the
    pause/stop control buttons wired to the --serve POST channel."""
    import numpy as np

    from opensplat_tpu.utils.report import TrainingReport

    rep = TrainingReport(str(tmp_path))
    rep.log(1, 0.5, 20.0, 100)
    rep.log(2, 0.4, 21.0, 100)
    rng = np.random.default_rng(0)
    rep.point_cloud(2, rng.normal(size=(500, 3)), rng.uniform(0, 1, (500, 3)))
    live = open(rep.write(live=True)).read()
    assert 'canvas id="pc"' in live
    assert "point cloud (step 2, 500 shown)" in live
    assert "__control__" in live and "Pause" in live and "Stop" in live
    # static report: cloud yes, control buttons no
    static = open(rep.write()).read()
    assert 'canvas id="pc"' in static
    assert "__control__" not in static

    # downsampling cap
    rep.point_cloud(3, rng.normal(size=(50000, 3)),
                    rng.uniform(0, 1, (50000, 3)), max_points=1000)
    assert rep._cloud["n"] == 1000
