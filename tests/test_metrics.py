"""Metrics logger tests."""
import json

from opensplat_tpu.utils.metrics import MetricsLogger, profile_trace


def test_metrics_jsonl(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = MetricsLogger(p, window=10)
    for s in range(1, 6):
        rec = m.step(s, loss=0.5 / s, psnr=20.0 + s, n_alive=100 + s, height=64,
                     width=64)
        assert rec["step"] == s
    m.refine(5, {"split": 3, "dup": 2, "cull": 1})
    m.close()
    lines = [json.loads(l) for l in open(p)]
    assert len(lines) == 6
    assert lines[-1] == {"type": "refine", "step": 5, "split": 3, "dup": 2, "cull": 1}
    assert lines[3]["steps_per_sec"] > 0
    assert lines[3]["mpix_per_sec"] > 0


def test_metrics_no_sink():
    m = MetricsLogger("")
    m.step(1, 0.1, 30.0, 10, 32, 32)
    assert m.last_record["n_gaussians"] == 10
    m.close()


def test_profile_trace_noop():
    with profile_trace(""):
        pass
