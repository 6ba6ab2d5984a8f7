"""Timer / StageTimes / device_trace (SURVEY §5 tracing subsystem)."""

import os
import time

import jax
import jax.numpy as jnp

from wetts_tpu.utils.profiling import StageTimes, Timer, device_trace


def test_timer_monotonic():
    t = Timer()
    time.sleep(0.01)
    e1 = t.elapsed()
    assert e1 >= 0.01
    t.reset()
    assert t.elapsed() < e1


def test_stage_times_report_and_percentiles():
    st = StageTimes()
    for ms in (1, 2, 3, 4, 100):
        st.add("decode", ms / 1e3)
    with st.stage("encode"):
        time.sleep(0.005)
    rep = st.report()
    assert rep["decode"]["n"] == 5
    assert abs(rep["decode"]["total_s"] - 0.110) < 1e-9
    assert rep["decode"]["p50_ms"] == 3.0
    assert rep["decode"]["p99_ms"] == 100.0
    assert rep["encode"]["mean_ms"] >= 5.0
    assert "decode" in st.summary() and "encode" in st.summary()


def test_device_trace_writes_files(tmp_path):
    out = str(tmp_path / "trace")
    with device_trace(out):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    found = [os.path.join(r, f) for r, _, fs in os.walk(out) for f in fs]
    assert found, "profiler trace produced no files"
