"""Sanity pins for the analytic AR-sampling roofline (utils/roofline.py)."""

from npe_pfn_tpu.models.config import TabICAConfig
from npe_pfn_tpu.utils.roofline import ar_sampling_roofline


def _cfg():
    return TabICAConfig(d_model=256, num_heads=2, num_layers=8, num_bars=1024)


def test_roofline_positive_and_monotone_in_context():
    cfg = _cfg()
    prev = None
    for ctx in (256, 512, 1024, 2048):
        rl = ar_sampling_roofline(cfg, num_ctx=ctx, num_qry=10_240,
                                  dim_theta=10, dim_x=10)
        assert rl["min_time_s"] > 0
        assert rl["samples_per_s_ceiling"] > 0
        if prev is not None:
            assert rl["min_time_s"] > prev["min_time_s"]
            assert rl["flops"] > prev["flops"]
        prev = rl


def test_roofline_scales_with_dim_theta_and_layers():
    cfg = _cfg()
    a = ar_sampling_roofline(cfg, 512, 10_240, dim_theta=2, dim_x=10)
    b = ar_sampling_roofline(cfg, 512, 10_240, dim_theta=10, dim_x=10)
    assert abs(b["flops"] / a["flops"] - 5.0) < 1e-6  # linear in AR steps
    small = TabICAConfig(d_model=256, num_heads=2, num_layers=4, num_bars=1024)
    c = ar_sampling_roofline(small, 512, 10_240, dim_theta=10, dim_x=10)
    assert c["flops"] < b["flops"]


def test_roofline_bound_label_consistent():
    cfg = _cfg()
    rl = ar_sampling_roofline(cfg, 2048, 10_240, dim_theta=10, dim_x=10)
    if rl["bound"] == "compute":
        assert rl["t_compute_s"] >= rl["t_memory_s"]
    else:
        assert rl["t_memory_s"] > rl["t_compute_s"]
    assert rl["min_time_s"] == max(rl["t_compute_s"], rl["t_memory_s"])
