"""Cost-model sanity: the analytic FLOPs/MFU accounting used by bench.py
and experiments/scaling.py stays self-consistent."""
from dp_gp_lvm_tpu.perf import V5E_PEAKS, dp_step_costs, mfu


def test_costs_scale_linearly_in_n():
    c1 = dp_step_costs(1024, 60, 10, 64, 20)
    c4 = dp_step_costs(4096, 60, 10, 64, 20)
    assert abs(c4.transcendentals / c1.transcendentals - 4.0) < 1e-6
    assert 3.5 < c4.mxu_flops / c1.mxu_flops < 4.1


def test_mfu_fields_and_floor():
    costs = dp_step_costs(8192, 120, 10, 128, 20)
    util = mfu(0.06, costs)
    for key in ("tflops_achieved", "mfu_pct", "roofline_pct",
                "binding_floor", "floor_ms"):
        assert key in util
    assert util["floor_ms"] > 0
    assert util["binding_floor"] in ("mxu", "exp", "hbm")
    # the floor can never exceed the measured step (roofline <= ~100%
    # modulo measurement noise): with a generous step time it is far under
    assert util["roofline_pct"] < 120.0


def test_geometry_floor_dominates_at_small_q():
    # K=Q=10 contraction: geometric MXU floor must exceed the naive one
    costs = dp_step_costs(8192, 60, 10, 64, 20)
    assert costs.mxu_geom_flops > 5.0 * costs.mxu_flops
    assert V5E_PEAKS["exp_per_s"] > 0


def test_lane_padded_floor():
    # M=64: every (B, M, M) tile stage pads its minor dim to 128 lanes
    # -> the defended floor is 2x the geometric one; M=128 pads nothing
    c64 = dp_step_costs(1024, 60, 10, 64, 20)
    c128 = dp_step_costs(8192, 120, 10, 128, 20)
    assert abs(c64.lane_pad - 2.0) < 1e-9
    assert abs(c128.lane_pad - 1.0) < 1e-9
    u64 = mfu(0.006, c64)
    assert u64["padded_floor_ms"] >= u64["floor_ms"]
    # when mxu/exp binds, padding scales the floor by exactly lane_pad
    if u64["binding_floor"] in ("mxu", "exp"):
        assert abs(u64["padded_floor_ms"] / u64["floor_ms"] - 2.0) < 1e-6
