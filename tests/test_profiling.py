"""Profiling utilities + viz client (offline paths)."""

import logging

import numpy as np

from tpu_amg.utils.profiling import Timer, spmv_metrics, trace
from tpu_amg.utils.viz import PartitionMetrics, VizClient


def test_timer_logs_and_syncs(caplog):
    with caplog.at_level(logging.INFO, logger="tpu_amg.utils.profiling"):
        with Timer("span", sync_value=np.ones(4)) as t:
            pass
    assert t.elapsed >= 0
    assert any("span" in r.message for r in caplog.records)


def test_trace_noop_without_dir():
    with trace(None):
        x = 1 + 1
    assert x == 2


def test_spmv_metrics():
    m = spmv_metrics(nnz=7_000_000, nrows=1_000_000, seconds=43e-6)
    assert abs(m["nnz_per_s"] - 7e6 / 43e-6) / m["nnz_per_s"] < 1e-12
    assert m["effective_gb_per_s"] > 100


def test_viz_client_offline():
    c = VizClient("http://127.0.0.1:9")  # closed port
    assert c.health_check() is False
    assert c.update_partition([0, 1]) is False
    assert c.update_metrics(
        PartitionMetrics(iteration=0, size_cost=1.0, edge_cost=2.0, modularity=0.5)
    ) is False
