"""Metrics JSON-lines subsystem (SURVEY §5.5)."""
import io
import json
import time

from project3_cuda_path_tracer_tpu.utils.metrics import RenderMetrics


def test_rays_per_second_accumulates():
    out = io.StringIO()
    m = RenderMetrics(width=10, height=10, trace_depth=2, out=out)
    m.start(); time.sleep(0.01); m.stop(iters=5)
    assert m.rays_per_second > 0
    rec = m.emit(tag="x")
    parsed = json.loads(out.getvalue())
    assert parsed["iters"] == 5
    assert parsed["tag"] == "x"
    assert rec["resolution"] == [10, 10]
