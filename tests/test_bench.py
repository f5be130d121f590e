"""Smoke tests for bench.py's case builder — the driver's bench entry.

The real bench runs on the chip; these compile the same program shapes
at tiny config on CPU so a refactor can't silently break the driver run
(headline, IP hot-loop, LCM sampler paths).
"""

import sys

import pytest

import bench
from theatergen_tpu import config as cfg_mod


@pytest.fixture(autouse=True)
def _tiny_configs(monkeypatch):
    monkeypatch.setattr(cfg_mod, "sd15_config", cfg_mod.tiny_config)
    monkeypatch.setattr(cfg_mod, "sdxl_config", cfg_mod.tiny_xl_config)


def test_build_case_headline_and_timing():
    case = bench._build_case("sd15", 1, 2)
    ips, times = bench._time_case(*case, 1, trials=2)
    assert ips > 0 and len(times) == 2


def test_build_case_ip_hot_loop():
    run, params, lat0, ctx = bench._build_case("sd15", 1, 2, ip_tokens=4)
    # 77-token text + 4 IP tokens threaded through the context
    assert ctx.shape[1] == cfg_mod.tiny_config().text.max_length + 4
    out = run(params, lat0, ctx)
    assert out.shape == lat0.shape


def test_build_case_sdxl():
    case = bench._build_case("sdxl", 1, 2)
    ips, _ = bench._time_case(*case, 1, trials=1)
    assert ips > 0


def test_build_case_lcm():
    case = bench._build_case("sd15", 1, 2, sampler="lcm")
    ips, _ = bench._time_case(*case, 1, trials=1)
    assert ips > 0
