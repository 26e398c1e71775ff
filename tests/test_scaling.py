"""Scaling-efficiency harness (BASELINE.md target row 4: measured scaling
report at 1 chip / 1 host / N hosts). On the test's virtual CPU mesh the
assertion is *correctness* — identical psum-reduced statistics at every
mesh size and a structurally complete report — not efficiency (the 8
virtual devices share the host's cores; reference analogue: process-count
scaling with parent-process accumulator summation,
``alignment/multiprocessing.py:576-666``)."""

import jax
import numpy as np
import pytest

from montreal_forced_aligner_tpu.parallel.scaling import (
    build_workload,
    measure_scaling,
)


@pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 (virtual) devices"
)
def test_scaling_report_structure_and_stat_invariance():
    report = measure_scaling(
        device_counts=[1, 2, 4],
        per_device_batch=2,
        num_frames=40,
        repeats=2,
        warmup=1,
        workload_kwargs=dict(num_states=12, num_pdfs=16, num_gauss=2, feat_dim=6),
    )
    assert report["metric"] == "weak_scaling_efficiency"
    assert report["platform"] in ("cpu", "tpu")
    assert len(report["rows"]) == 3
    # total occupancy equals total masked frames (posterior normalization),
    # and psum counts each shard exactly once — so occ/N is the per-device
    # frame count at every mesh size
    occs = [r["occ_per_replica"] for r in report["rows"]]
    np.testing.assert_allclose(occs, occs[0], rtol=1e-4)
    for row, n in zip(report["rows"], (1, 2, 4)):
        assert row["devices"] == n
        assert row["global_batch"] == 2 * n
        assert row["min_step_s"] > 0
        assert row["weak_efficiency"] > 0
    assert report["rows"][0]["weak_efficiency"] == 1.0
    # the 1-device unsharded-vs-mesh comparison ran
    assert report["mesh_overhead_1dev_pct"] is not None


def test_build_workload_deterministic():
    a = build_workload(4, num_frames=20, num_states=8, num_pdfs=8,
                       num_gauss=2, feat_dim=4, seed=3)
    b = build_workload(4, num_frames=20, num_states=8, num_pdfs=8,
                       num_gauss=2, feat_dim=4, seed=3)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(
        np.asarray(a[2].state_pdf), np.asarray(b[2].state_pdf)
    )
