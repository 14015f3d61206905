"""The bench phase gate's verdict function — unit-tested at module level
so a hot host window is demonstrably refused by each probe SEAT without
needing to induce one (the round-14 python-probe seating requirement:
'one hot window demonstrably refused by the python seat')."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


class TestPhaseGateVerdict:
    def test_calm_window_passes_all_seats(self):
        # healthy readings from the round-13/14 calm records
        assert bench.probe_breaches(0.22, 0.55, 3.4) == []

    def test_scan_seat_refuses(self):
        out = bench.probe_breaches(0.60, 0.5, 3.0)
        assert len(out) == 1 and "scan probe" in out[0]

    def test_compute_seat_refuses(self):
        # the 183.4/226.0 ok-scan-probed pair's episode shape: compute
        # throughput degraded while the scan probe read normal
        out = bench.probe_breaches(0.25, 3.8, 3.0)
        assert len(out) == 1 and "compute probe" in out[0]

    def test_python_seat_refuses_sustained_throttle(self):
        # the round-13 A/B shape: dedup_embedding 12-65 s against a
        # 1.4 s row while BOTH JVM probes sat calm — only the python
        # seat can refuse this window
        out = bench.probe_breaches(0.25, 0.5, 14.0)
        assert len(out) == 1 and "python probe" in out[0]

    def test_python_seat_band_edges(self):
        trip = bench.PYTHON_PHASE_GATE_RATIO * bench.PYTHON_PROBE_FROZEN_SEC
        assert bench.probe_breaches(0.2, 0.5, trip - 0.01) == []
        assert bench.probe_breaches(0.2, 0.5, trip + 0.01) != []

    def test_python_seat_optional_for_legacy_callers(self):
        # a caller without a python reading still gets the two-seat
        # verdict (probe readings recorded before round 14)
        assert bench.probe_breaches(0.22, 0.55) == []

    def test_all_seats_refuse_together(self):
        out = bench.probe_breaches(1.0, 5.0, 30.0)
        assert len(out) == 3
