"""Device fixed-cost probe and latency-calibrated path thresholds.

The host<->device fixed cost decides when batched device paths beat the
NumPy ones (orientation decision matrices, MinHash intersection
matmuls). Those crossovers were measured on a tunneled v5e where one
round trip costs ~25 ms; on a direct-attached chip the fixed cost is
tens of microseconds and the device paths win far earlier. Rather than
hard-coding the tunnel numbers, measure one tiny round-trip transfer
per process and scale the thresholds by sqrt(fixed/anchor) — compute
grows ~n^2 on the host side, so the crossover n moves with the square
root of the fixed cost.

ALLWAVE_DEVICE_FIXED_MS overrides the probe (useful for tests and for
pods where the first transfer is not representative).
"""

from __future__ import annotations

import math
import os
import time
from typing import Optional

#: fixed cost the measured thresholds were calibrated against (the
#: axon-tunneled v5e round trip) — at this value every threshold equals
#: its measured base, so behavior on the calibration machine is
#: unchanged by the probe.
ANCHOR_MS = 25.0

_fixed_ms: Optional[float] = None


def device_fixed_cost_ms() -> float:
    """One-time measured host->device->host round trip (ms) for a tiny
    array on the default backend. 0.0 on the CPU backend (device ==
    host; the NumPy paths are the right default there)."""
    global _fixed_ms
    env = os.environ.get("ALLWAVE_DEVICE_FIXED_MS")
    if env:
        try:
            return float(env)
        except ValueError:
            pass
    if _fixed_ms is None:
        try:
            import jax
            import numpy as np

            if jax.default_backend() == "cpu":
                _fixed_ms = 0.0
            else:
                probe = np.ones((8, 128), np.int32)
                np.asarray(jax.device_put(probe))  # warm the path
                t0 = time.perf_counter()
                np.asarray(jax.device_put(probe))
                _fixed_ms = (time.perf_counter() - t0) * 1e3
        except Exception:
            # no usable device — callers fall back to host paths anyway
            _fixed_ms = ANCHOR_MS
    return _fixed_ms


def calibrated_threshold(base: int, lo: int, hi: int) -> int:
    """Scale a measured crossover `base` (calibrated at ANCHOR_MS fixed
    cost) to the current device's fixed cost, clamped to [lo, hi].

    fixed == ANCHOR_MS -> base (the calibration machine). A
    direct-attached chip (fixed ~0.1 ms) pulls the crossover down by
    ~sqrt(250) until the clamp; a slower link pushes it up."""
    fixed = device_fixed_cost_ms()
    if fixed <= 0.0:
        return base
    return int(min(hi, max(lo, round(base * math.sqrt(fixed / ANCHOR_MS)))))
