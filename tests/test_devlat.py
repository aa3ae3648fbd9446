"""Latency-calibrated device-path thresholds (utils/devlat.py)."""

import math

import pytest

from allwave_tpu.utils import devlat


@pytest.fixture(autouse=True)
def _reset(monkeypatch):
    monkeypatch.setattr(devlat, "_fixed_ms", None)
    monkeypatch.delenv("ALLWAVE_DEVICE_FIXED_MS", raising=False)
    yield
    devlat._fixed_ms = None


def test_cpu_backend_probe_is_zero():
    # tests run on the CPU backend (conftest) — device == host
    assert devlat.device_fixed_cost_ms() == 0.0


def test_env_override(monkeypatch):
    monkeypatch.setenv("ALLWAVE_DEVICE_FIXED_MS", "25.0")
    assert devlat.device_fixed_cost_ms() == 25.0


def test_anchor_preserves_measured_bases(monkeypatch):
    """At the calibration fixed cost the thresholds equal the measured
    tunnel values — the probe never changes calibration-machine
    behavior."""
    monkeypatch.setenv("ALLWAVE_DEVICE_FIXED_MS", str(devlat.ANCHOR_MS))
    assert devlat.calibrated_threshold(192, 48, 384) == 192
    assert devlat.calibrated_threshold(512, 128, 1024) == 512


def test_fast_link_lowers_thresholds(monkeypatch):
    monkeypatch.setenv("ALLWAVE_DEVICE_FIXED_MS", "0.25")  # direct chip
    # sqrt(0.25/25) = 0.1 -> 19.2 clamps to lo
    assert devlat.calibrated_threshold(192, 48, 384) == 48
    assert devlat.calibrated_threshold(512, 128, 1024) == 128


def test_slow_link_raises_thresholds(monkeypatch):
    monkeypatch.setenv("ALLWAVE_DEVICE_FIXED_MS", "100.0")
    assert devlat.calibrated_threshold(192, 48, 384) == round(192 * 2)
    assert devlat.calibrated_threshold(512, 128, 1024) == min(
        1024, round(512 * math.sqrt(4))
    )


def test_zero_fixed_cost_returns_base(monkeypatch):
    monkeypatch.setenv("ALLWAVE_DEVICE_FIXED_MS", "0")
    assert devlat.calibrated_threshold(192, 48, 384) == 192
