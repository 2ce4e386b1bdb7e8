"""VQF integrator placeholder.

The reference's default integrator is a full port of the VQF filter
(imu_integration/vqf.rs, 1241 LoC). The faithful port is scheduled as its own
milestone (it is also the prime candidate for the C++ native hot loop — 1kHz
sequential scalar filter). Until then this aliases Complementary V2, which the
reference itself uses for <10s clips (lib.rs:163), and logs the substitution.
"""
from __future__ import annotations

import logging

log = logging.getLogger(__name__)
_warned = False


def integrate_vqf(imu_data, duration_ms):
    global _warned
    if not _warned:
        log.warning("VQF integrator port pending; using Complementary filter")
        _warned = True
    from . import integrate_complementary
    return integrate_complementary(imu_data, duration_ms)
