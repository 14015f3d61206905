"""The bench phase gate's verdict function — unit-tested at module level
so a hot host window is demonstrably refused by each probe SEAT without
needing to induce one (the round-14 python-probe seating requirement:
'one hot window demonstrably refused by the python seat')."""

import sys

import pytest
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


class TestRetryTrigger:
    """The stall-aware retry's two triggers (module-level retry_trigger):
    the round-14 steal trigger plus the round-15 clean-host band-breach
    trigger (VERDICT r14 'What's missing' #1 — the zero-steal episode
    class: q6_modes read 46.29 s with steal_d=29, gc 0, 6.9x its frozen
    2.84 row, and a steal-only trigger never re-measured it)."""

    N = 32  # vCPUs

    def test_steal_trigger_fires(self):
        # 8 s reading, 40% of the box stolen: 0.40*32*800 jiffies
        d = {"steal_d": int(0.40 * self.N * 800)}
        assert bench.retry_trigger(8.0, d, self.N) == "steal"

    def test_calm_reading_no_trigger(self):
        assert bench.retry_trigger(2.9, {"steal_d": 3}, self.N, 2.84) is None

    def test_clean_host_breach_fires_on_the_r14_q6_modes_shape(self):
        # the exact reading that sailed past the steal trigger:
        # 46.29 s, steal_d=29 (share 0.02%), gc 0, frozen row 2.84
        d = {"steal_d": 29, "gc_d_ms": 0}
        assert bench.retry_trigger(46.29, d, self.N, 2.84) == "clean_breach"

    def test_band_respected(self):
        # frozen 2.80 with a ±0.5 band: breach wire sits at 2x(2.80+0.5)
        d = {"steal_d": 0, "gc_d_ms": 0}
        assert bench.retry_trigger(6.5, d, self.N, 2.80, 0.5) is None
        assert bench.retry_trigger(6.7, d, self.N, 2.80, 0.5) == "clean_breach"

    def test_breach_with_steal_attribution_is_not_clean(self):
        # >2x frozen but 3% stolen (above the 1% clean wire, below the 5%
        # stall wire): attribution is ambiguous — no re-measure, the
        # sweep-level steal share prices it (the r14 watch-item class)
        d = {"steal_d": int(0.03 * self.N * 100 * 8), "gc_d_ms": 0}
        assert bench.retry_trigger(8.0, d, self.N, 2.84) is None

    def test_breach_with_gc_attribution_is_not_clean(self):
        # >2x frozen but the driver spent 20% of the wall in GC: the
        # reading is attributed (heap, not plan) — no re-measure
        d = {"steal_d": 0, "gc_d_ms": 1600}
        assert bench.retry_trigger(8.0, d, self.N, 2.84) is None

    def test_no_frozen_row_never_arms_clean_breach(self):
        assert bench.retry_trigger(46.0, {"steal_d": 0}, self.N, None) is None

    def test_subsecond_reading_never_retries(self):
        d = {"steal_d": int(0.9 * self.N * 100 * 0.4)}
        assert bench.retry_trigger(0.4, d, self.N, 0.05) is None


class TestRetryKeepPolicy:
    """ADVICE r14: a CLEAN re-measure replaces the poisoned reading even
    when slower (min-of-two conditioned on a host trigger biases medians
    below the no-retry frozen baselines); min applies only when the
    retry also hit a hot window."""

    N = 32

    def test_clean_retry_replaces_even_if_slower(self):
        assert bench.retry_keep(3.0, 3.4, {"steal_d": 0}, self.N) == 3.4

    def test_clean_retry_replaces_when_faster(self):
        assert bench.retry_keep(46.29, 2.9, {"steal_d": 1}, self.N) == 2.9

    def test_hot_retry_keeps_lesser_poison(self):
        hot = {"steal_d": int(0.40 * self.N * 100 * 10)}
        assert bench.retry_keep(8.0, 10.0, hot, self.N) == 8.0
        assert bench.retry_keep(12.0, 10.0, hot, self.N) == 10.0


class TestRetryBudget:
    """VERDICT r14 trivial nit: the 120 s/sweep retry budget is enforced
    by a >0 pre-check, so the LAST retry can overrun it — the spend
    helper must flag that honestly ('exhausted mid-retry'), never imply
    a hard cap held."""

    def test_normal_spend(self):
        left, over = bench.retry_budget_spend(120.0, 10.0)
        assert left == 110.0 and not over

    def test_overrun_flagged(self):
        # the r14 record-sweep shape: last retry started inside budget
        # and ran 2.7 s past it
        left, over = bench.retry_budget_spend(1.0, 3.7)
        assert over and left == pytest.approx(-2.7)

    def test_exact_exhaustion_is_not_overrun(self):
        left, over = bench.retry_budget_spend(5.0, 5.0)
        assert left == 0.0 and not over
