"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ..., "repeats": N}

Each query is executed to completion (collect — the reference's CollatePOp
boundary, fpdb-main/src/Client.cpp:104-110) after a warm-up pass of the
catalog so parquet footer reads don't pollute per-query numbers.

Protocol (frozen, see BENCH_BASELINE.md): every query runs
$PYSPARKDB_BENCH_REPEATS times (default 3) in ROUND-ROBIN order — full
sweep 1, then sweep 2, ... — and reports the per-query MEDIAN; "value" is
the sum of medians. Round-robin decorrelates a query's repeats from one
GC/compaction episode; medians discard the single-run outliers that made
round-over-round single-run numbers unattributable (2.5-8x family-wide
swings with zero code change, VERDICT round 2). Set repeats=1 for a quick
iteration loop.
"""

from __future__ import annotations

import json
import os
import sys
import time

# ---- phase-gate frozen rows (BENCH_BASELINE.md protocol) -------------
# Module-level so tests can drive the verdict function directly.
SCAN_PROBE_FROZEN_SEC = 0.2158  # q6's frozen row, BENCH_BASELINE.md
PHASE_GATE_RATIO = 1.5
# Compute-probe frozen row (BENCH_BASELINE.md round-13 amendment):
# median of 10 isolated probe medians on the healthy protocol host
# (0.442-0.84 s, median 0.527), consistent with the round-12 first
# readings (0.37/0.91). The band is WIDER than the scan probe's
# (2.5x vs 1.5x) because the probe's healthy variance is ~2x; the
# trip point (1.375 s) sits above every recorded healthy reading and
# far below the 3.6-5.2 s compute-phase episodes it exists to catch
# (the 183.4-vs-226.0 ok-probed pair that motivated it).
COMPUTE_PROBE_FROZEN_SEC = 0.55
COMPUTE_PHASE_GATE_RATIO = 2.5
# Python-probe frozen row (round-14 amendment): MAX of 3 back-to-back
# sustained mapInPandas jobs (~2 s of all-core worker arithmetic each) —
# the round-13 probe body was too short to hit the sustained-load
# throttle it exists to detect (its readings sat flat at 0.7-1.3 s
# across both the 192 s calm window and the 298 s hot one). The
# lengthened body reads 1.9-2.5 s per job steady-state; in BENCH
# context the max-of-3 reads 3.0-3.8 s calm (the first job pays
# residual worker warmup) and 13.3-15.4 s in the two hot windows
# recorded while seating it — the separation the old body never
# showed. The throttle that produced 12-65 s dedup_embedding episodes
# against a 1.4 s row (9-46x) puts sustained worker CPU far past the
# 3x trip point (9.6 s).
PYTHON_PROBE_FROZEN_SEC = 3.2
PYTHON_PHASE_GATE_RATIO = 3.0


def host_counters() -> dict:
    """CPU-steal jiffies and PSI some-total — the two counters that
    attribute an in-sweep episode to the HOST rather than the plan. The
    round-13/14 diagnosis of the three-round ev_interval_overlap band
    breach: the VM is episodically descheduled by a co-tenant (a plain
    time.sleep(5) loop lost 14-28 s of wall-clock with ZERO local CPU
    use, and /proc/stat steal shows ~0.6 cores stolen on average over
    this host's uptime). A query reading taken inside such a window is a
    measurement of the hypervisor, not the query; recording the steal /
    pressure DELTA beside every reading makes that attribution data, not
    adjudication prose."""
    out = {}
    try:
        with open("/proc/stat") as f:
            out["steal_jiffies"] = int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        pass
    try:
        with open("/proc/pressure/cpu") as f:
            out["psi_some_total_us"] = int(
                f.readline().rsplit("total=", 1)[1])
    except (OSError, IndexError, ValueError):
        pass
    # Disk-side attribution (VERDICT r15 task #5): the round-15 close saw
    # zero-steal, zero-PSI windows still failing the scan probe — shared-I/O
    # co-tenancy that neither CPU counter prices. Sum sectors moved and
    # ms-doing-I/O across whole-disk devices (/sys/block lists only whole
    # disks, so partitions are not double-counted); a reading whose
    # disk_ms_d approaches its wall-clock spent the window waiting on the
    # device, and a scan-speed reading with huge disk_sect_d against calm
    # neighbors marks an I/O-phase episode.
    try:
        disks = {
            d for d in os.listdir("/sys/block")
            if not d.startswith(("loop", "ram", "zram"))
        }
        sect = ms = 0
        with open("/proc/diskstats") as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 13 and parts[2] in disks:
                    sect += int(parts[5]) + int(parts[9])
                    ms += int(parts[12])
        out["disk_sectors"] = sect
        out["disk_io_ms"] = ms
    except (OSError, IndexError, ValueError):
        pass
    return out


def probe_breaches(
    scan_sec: float, compute_sec: float, python_sec: float | None = None
) -> list[str]:
    """Which probe(s) exceed their frozen band — ALL seated probes hold a
    vote in the gate verdict: the 183.4/226.0 ok-probed pair proved
    compute-phase episodes sail straight through a scan-only gate
    (round-13 amendment), and the round-13 interleaved A/B proved
    sustained Python-worker throttling is invisible to both JVM-side
    probes (round-14 amendment seats the python probe)."""
    out = []
    if scan_sec > PHASE_GATE_RATIO * SCAN_PROBE_FROZEN_SEC:
        out.append(
            f"scan probe {scan_sec:.3f}s > {PHASE_GATE_RATIO}x "
            f"frozen {SCAN_PROBE_FROZEN_SEC}s")
    if compute_sec > COMPUTE_PHASE_GATE_RATIO * COMPUTE_PROBE_FROZEN_SEC:
        out.append(
            f"compute probe {compute_sec:.3f}s > "
            f"{COMPUTE_PHASE_GATE_RATIO}x frozen "
            f"{COMPUTE_PROBE_FROZEN_SEC}s")
    if python_sec is not None and python_sec > (
            PYTHON_PHASE_GATE_RATIO * PYTHON_PROBE_FROZEN_SEC):
        out.append(
            f"python probe {python_sec:.3f}s > "
            f"{PYTHON_PHASE_GATE_RATIO}x frozen "
            f"{PYTHON_PROBE_FROZEN_SEC}s")
    return out


# --- stall-aware retry decision logic (module-level, unit-tested) --------
# Two triggers decide a one-shot re-measure of a timed reading:
#   "steal"        — a co-tenant took >STALL_STEAL_SHARE of the box's
#                    cpu-time during the reading (round-14 amendment;
#                    threshold rationale in main()'s retry comment);
#   "clean_breach" — round-15 amendment (VERDICT r14 "What's missing" #1):
#                    the reading exceeded its FROZEN row+band by
#                    >CLEAN_BREACH_RATIO while the host was exonerated by
#                    its own counters (steal share < CLEAN_STEAL_SHARE,
#                    driver GC < CLEAN_GC_SHARE of wall) — the zero-steal
#                    episode class the r14 record sweep proved exists
#                    (q6_modes 46.29 s, steal_d=29, gc 0: 6.9x frozen,
#                    invisible to a steal-only trigger).
STALL_STEAL_SHARE = 0.05
CLEAN_STEAL_SHARE = 0.01
CLEAN_GC_SHARE = 0.10
CLEAN_BREACH_RATIO = 2.0


def reading_steal_share(dur: float, deltas: dict, n_cpus: int) -> float:
    """Fraction of the box's cpu-time stolen during one reading
    (steal_d is in 10 ms jiffies summed across vCPUs)."""
    return deltas.get("steal_d", 0) * 0.01 / (n_cpus * max(dur, 1e-9))


def retry_trigger(
    dur: float, deltas: dict, n_cpus: int,
    frozen: float | None = None, band: float = 0.0,
) -> str | None:
    """Which trigger (if any) warrants a one-shot re-measure: "steal",
    "clean_breach", or None. ``frozen``/``band`` are the query's
    BENCH_BASELINE.md row; None means no baseline (new checkout) and the
    clean-breach trigger cannot arm."""
    if dur <= 0.5:
        return None  # sub-second readings: retry cost exceeds its value
    share = reading_steal_share(dur, deltas, n_cpus)
    if share > STALL_STEAL_SHARE:
        return "steal"
    if frozen is not None and dur > CLEAN_BREACH_RATIO * (frozen + band):
        gc_share = deltas.get("gc_d_ms", 0) / 1000.0 / max(dur, 1e-9)
        if share < CLEAN_STEAL_SHARE and gc_share < CLEAN_GC_SHARE:
            return "clean_breach"
    return None


def retry_budget_spend(budget_s: float, retry_sec: float) -> tuple[float, bool]:
    """Deduct a fired retry from the per-sweep budget. The returned bool
    flags a retry that ran past the remaining allowance: the pre-check
    (budget > 0) passed, but the retry itself overran — reported honestly
    as "exhausted mid-retry" rather than implying a hard cap held (the
    r14 record sweep spent 122.7 s of its 120 s budget this way)."""
    left = budget_s - retry_sec
    return left, left < 0


def retry_keep(dur: float, dur2: float, deltas2: dict, n_cpus: int) -> float:
    """Which reading a fired retry records (ADVICE r14 keep-policy): a
    CLEAN re-measure (own steal share under the stall threshold) replaces
    the poisoned reading outright — even if slower — so medians stay
    protocol-comparable with the no-retry frozen baselines instead of
    biasing low via unconditional min-of-two; when the retry ALSO hit a
    hot window, min() keeps the lesser poison."""
    if reading_steal_share(dur2, deltas2, n_cpus) <= STALL_STEAL_SHARE:
        return dur2
    return min(dur, dur2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pysparkdb.session import get_spark

    spark = get_spark(
        "pysparkdb-bench",
        master=f"local[{cpus}]",
        extra_confs={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pysparkdb.queries import load_all
    from pysparkdb.queries.base import tables

    specs = load_all()
    bench_names = os.environ.get("PYSPARKDB_BENCH_QUERIES")
    names = (
        [n.strip() for n in bench_names.split(",") if n.strip()]
        if bench_names
        else sorted(specs)
    )
    unknown = [n for n in names if n not in specs]
    if unknown:
        # fail BEFORE the multi-second warm-up, naming the typo
        raise SystemExit(f"unknown PYSPARKDB_BENCH_QUERIES entries: {unknown}")

    tables(spark, sf_dir)  # catalog warm-up (footer reads, conf apply)
    # tables() re-applied the engine's DEFAULT_CONFS, whose shuffle
    # parallelism (32) would silently override the $SPARK_GRAFT_CPUS value
    # this bench just configured — put the knob back in charge
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    # engine warm-up: one scan+agg and one join execute to completion so
    # JVM/codegen/shuffle-service warmup is not billed to the first query
    specs["q6"].fn(spark, sf_dir).collect()
    specs["q3"].fn(spark, sf_dir).collect()
    # Python/Arrow worker-pool warmth: PythonWorkerFactory reaps idle
    # workers after a HARDCODED 60 s (IDLE_WORKER_TIMEOUT_NS — no conf),
    # so a long JVM-only stretch leaves the NEXT pandas_udf /
    # applyInPandasWithState query paying a 2-7 s pool restart that is
    # that query's position in the sweep, not its cost (the adjudicated
    # emb_quantize/ev_stateful artifact, BENCH_BASELINE.md). Re-probe
    # between timed queries whenever >30 s have passed since the last
    # probe: the pool's idle clock then never reaches 30 s + one query
    # (< 60 s), and the warm probe costs ~0.5 s × ~2/min — outside every
    # timed region, ~1-2 % sweep wall-clock, zero effect on medians.
    _last_warm = None  # None, not 0.0: perf_counter's epoch is
    # unspecified (seconds-since-boot on Linux), so on a freshly booted
    # host a 0.0 sentinel would make the INITIAL probe a no-op and bill
    # the first mapInPandas query the worker spinup again

    def keep_python_pool_warm() -> None:
        nonlocal _last_warm
        if _last_warm is not None and time.perf_counter() - _last_warm < 30.0:
            return
        spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
            lambda it: it, schema="id long"
        ).count()
        _last_warm = time.perf_counter()

    keep_python_pool_warm()  # initial pre-fork (first probe pays spinup)

    def empty_job_ms(n: int = 20) -> float:
        """Mean scheduling latency of an empty job — the host-phase stamp.
        Barrier-heavy queries (streams, iterative graph) run dozens of
        sequential jobs, so a host phase that inflates per-job latency
        (measured 114 ms vs the ~15 ms typical for this box) inflates THEM
        2-3x while scan-bound queries barely move; recording the probe
        beside the medians lets a regression call separate code drift from
        host phase (the round-8 ev_stateful adjudication)."""
        t0 = time.perf_counter()
        for _ in range(n):
            spark.range(1).count()
        return round((time.perf_counter() - t0) / n * 1000, 1)

    def scan_probe_sec(n: int = 3) -> float:
        """Median of n q6 executions — the SCAN-BOUND host-phase stamp.
        empty_job_ms catches scheduling-latency phases (barrier-heavy
        queries drift, scans don't) but MISSED the round-11 degraded
        phase: a sweep ran 1.216x vs baseline with NORMAL empty-job
        stamps because the slowdown was in scan/compute throughput, not
        scheduling. q6 is one pruned scan + one aggregate — the purest
        throughput probe in the registry; its frozen row is 0.2158 s, so
        a probe reading ≫0.3 s says 'degraded phase' before a single
        timed query runs, and the before/after pair brackets the sweep
        the way the latency stamps do."""
        from statistics import median as _med

        reads = []
        for _ in range(n):
            t0 = time.perf_counter()
            specs["q6"].fn(spark, sf_dir).collect()
            reads.append(time.perf_counter() - t0)
        return round(_med(reads), 3)

    def compute_probe_sec(n: int = 3) -> float:
        """Median of n shuffle+aggregate micro-jobs — the COMPUTE-BOUND
        host-phase stamp, closing the scan probe's blind spot. Round 12's
        closing pair read 183.4 vs 226.0 s an hour apart, BOTH with ok
        scan probes and zero code change between them: the degradation
        sat in shuffle/compute throughput, which one pruned scan + one
        aggregate never touches. This probe is a fixed synthetic
        exchange — range(4M) → hash key → group-aggregate — no IO, one
        whole-stage-codegen span + one Exchange, so it isolates exactly
        the tier the scan probe can't see. Frozen row + band in
        BENCH_BASELINE.md (round-13 amendment): the gate verdict now
        consults this probe alongside the scan probe; adjudications
        should quote all three stamp pairs."""
        from statistics import median as _med

        reads = []
        for _ in range(n):
            t0 = time.perf_counter()
            (spark.range(4_000_000)
                  .selectExpr("id % 1009 AS k", "id")
                  .groupBy("k").sum("id").collect())
            reads.append(time.perf_counter() - t0)
        return round(_med(reads), 3)

    def python_probe_sec(n: int = 3) -> float:
        """MAX of n back-to-back SUSTAINED pandas-UDF jobs — the
        PYTHON-WORKER-bound host-phase stamp, closing the blind spot the
        round-13 interleaved A/B exposed: dedup_embedding (a sustained
        pandas-UDF query) read 10-65 s against its 1.4 s row while the
        compute probe sat at 0.31 s beside it — whatever throttles
        sustained Python-worker compute is invisible to a short JVM-only
        exchange. The round-13 body (range(1M), one square per batch)
        was too SHORT to trip that throttle: its readings sat flat at
        0.7-1.3 s across both the 192 s calm record window and the 298 s
        hot one, so it stamped without separating phases. This body
        pushes ~2 s of all-core worker arithmetic per job (range(8M) →
        40 modmul rounds per Arrow batch → aggregate) and reports the
        MAX of n jobs, so one throttled job in ~6 s of sustained load is
        enough to read hot. Frozen row + band in BENCH_BASELINE.md
        (round-14 amendment): 3.2 s x 3.0 — the probe now holds the
        third gate seat; adjudications quote all FOUR stamp pairs."""
        def body(it):
            import pandas as _pd  # noqa: F401 (worker-local)

            for pdf in it:
                x = pdf["id"]
                for _ in range(40):
                    x = x * x % 1000003 + 1
                pdf["id"] = x
                yield pdf

        reads = []
        for _ in range(n):
            t0 = time.perf_counter()
            (spark.range(8_000_000).repartition(int(cpus))
                  .mapInPandas(body, schema="id long")
                  .selectExpr("sum(id)").collect())
            reads.append(time.perf_counter() - t0)
        return round(max(reads), 3)

    # ---- automated phase gate (BENCH_BASELINE.md protocol) ----------
    # The round-11 record sweep was gated by a MANUAL q1/ssb1_1/q6 probe;
    # this automates it: a probe above its frozen band means the HOST is
    # in a degraded-throughput phase and any sweep timed now is
    # protocol-incomparable with the frozen baselines. Frozen rows +
    # verdict logic live at module level (probe_breaches) so the gate is
    # unit-testable. Default behavior is to LABEL the sweep ("phase":
    # "degraded" in the JSON) so unattended per-round runs still produce
    # a record; set PYSPARKDB_BENCH_PHASE_GATE=refuse to exit(3) before
    # timing instead (the definitive record-sweep mode — a degraded
    # sweep then cannot silently become a baseline).
    #
    # the frozen probe rows were recorded at the protocol config (sf0.1,
    # local[32]); a quick iteration run at sf0.01 reads the probes as
    # fixed overhead and would trip the gate spuriously — only a
    # protocol-comparable sweep gets gated/labelled
    gate_applicable = sf_dir.rstrip("/").endswith("sf0.1") and cpus == "32"

    latency_before = empty_job_ms()
    scan_before = scan_probe_sec()
    compute_before = compute_probe_sec()
    python_before = python_probe_sec()
    gate_mode = os.environ.get("PYSPARKDB_BENCH_PHASE_GATE", "label")

    if gate_applicable:
        breaches = probe_breaches(scan_before, compute_before, python_before)
        if breaches:
            print("phase gate: " + "; ".join(breaches) +
                  " — degraded host phase", file=sys.stderr)
            if gate_mode == "refuse":
                raise SystemExit(3)
    repeats = int(os.environ.get("PYSPARKDB_BENCH_REPEATS", "3"))
    times: dict[str, list[float]] = {name: [] for name in names}
    # Per-execution timeline (VERDICT r13 #1): every reading's sweep
    # position, rep, wall-clock start (unix epoch + offset from the first
    # timed query) and duration, written as a SIDECAR json so an in-sweep
    # episode (the three-round ev_interval_overlap breach) can be
    # correlated with its neighbors and the probe stamps without bloating
    # the one-line driver record.
    timeline: list[dict] = []
    sweep_t0 = time.time()
    sweep_hc0 = host_counters()
    n_cpus = os.cpu_count() or int(cpus)
    # Stall-aware retry (round-14 metrology amendment, BENCH_BASELINE.md;
    # trigger + keep-policy logic at module level — retry_trigger /
    # retry_keep — round-15 amendments add the clean-host band-breach
    # trigger and the keep-clean-reading policy): when the steal counter
    # shows a co-tenant took >5% of the box's cpu-time during a reading,
    # the reading measured the hypervisor, not the query: re-measure ONCE,
    # recording both in the timeline. The threshold is 5%, not 25%,
    # because of BARRIER AMPLIFICATION: stealing k of 32 vCPUs hard
    # inflates every 32-task wave by the straggler's slowdown while
    # box-level steal share stays ≈k/32 — measured in this round's
    # sweeps: episode readings (ev_interval_overlap 39.9 s,
    # dedup_embedding 44 s, ev_stream_join 17.6 s) carried 8-24% share
    # while the calm-reading median share was 0.09-0.37%. A retry can
    # only REMOVE host poison — it cannot read faster than the query's
    # true cost — so medians stay protocol-comparable with the frozen
    # baselines. Total retry time is budgeted (120 s/sweep) so a
    # fully-hot sweep cannot double its own wall-clock. Off via
    # PYSPARKDB_BENCH_STALL_RETRY=0.
    stall_retry = os.environ.get("PYSPARKDB_BENCH_STALL_RETRY", "1") != "0"
    retry_budget_s = 120.0

    # Frozen rows for the clean-breach trigger (retry_trigger above),
    # parsed from BENCH_BASELINE.md with the staleness audit's parser —
    # the same parse the judge replicates. A fresh checkout without the
    # baseline file simply never arms the clean-breach trigger.
    # The clean-breach trigger arms ONLY under the protocol config the
    # frozen rows were recorded at (sf0.1, local[32]) — against any other
    # sf/cpu count the rows are not this run's bands and every reading
    # would spuriously "breach" (the gate_applicable guard, same as the
    # probe seats). The steal trigger is config-independent and stays on.
    frozen_rows: dict[str, float] = {}
    frozen_bands: dict[str, float] = {}
    if gate_applicable:
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "scripts"))
            from baseline_staleness_audit import parse_frozen

            frozen_rows, frozen_bands = parse_frozen(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_BASELINE.md"))
        except Exception as exc:  # no baseline file on a fresh checkout
            print(f"bench: no frozen baselines for clean-host trigger "
                  f"({exc})", file=sys.stderr)

    def driver_gc_ms() -> int:
        """Cumulative driver-JVM GC time — the third attribution axis
        beside steal and PSI: a multi-second reading whose gc_d_ms
        approaches its wall-clock was a driver full-GC pause (the 16 GiB
        heap carrying ~200 queries of accumulated plan/broadcast state),
        not the query's plan."""
        try:
            beans = (spark._jvm.java.lang.management.ManagementFactory
                     .getGarbageCollectorMXBeans())
            return sum(beans.get(i).getCollectionTime()
                       for i in range(beans.size()))
        except Exception:
            return 0

    def timed_run(spec):
        hc0 = host_counters()
        gc0 = driver_gc_ms()
        t_wall = time.time()
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).collect()
        dur = time.perf_counter() - t0
        hc1 = host_counters()
        deltas = {}
        gc1 = driver_gc_ms()
        if gc1 or gc0:
            deltas["gc_d_ms"] = gc1 - gc0
        # host-attribution deltas (see host_counters): steal is in
        # jiffies (10 ms each, summed across vCPUs) — a reading whose
        # steal_d approaches n_cpus*sec*100 spent its wall-clock being
        # descheduled, not computing
        if "steal_jiffies" in hc0 and "steal_jiffies" in hc1:
            deltas["steal_d"] = hc1["steal_jiffies"] - hc0["steal_jiffies"]
        if "psi_some_total_us" in hc0 and "psi_some_total_us" in hc1:
            deltas["psi_d_us"] = (
                hc1["psi_some_total_us"] - hc0["psi_some_total_us"])
        # disk-side attribution (see host_counters): sectors moved and
        # device-busy ms across the reading's window
        if "disk_sectors" in hc0 and "disk_sectors" in hc1:
            deltas["disk_sect_d"] = hc1["disk_sectors"] - hc0["disk_sectors"]
        if "disk_io_ms" in hc0 and "disk_io_ms" in hc1:
            deltas["disk_ms_d"] = hc1["disk_io_ms"] - hc0["disk_io_ms"]
        return t_wall, dur, deltas

    for _rep in range(repeats):
        for pos, name in enumerate(names):
            spec = specs[name]
            keep_python_pool_warm()
            t_wall, dur, deltas = timed_run(spec)
            entry = {
                "name": name, "rep": _rep, "pos": pos,
                "start_unix": round(t_wall, 3),
                "start_offset_sec": round(t_wall - sweep_t0, 3),
                "sec": round(dur, 4), **deltas,
            }
            trigger = retry_trigger(
                dur, deltas, n_cpus,
                frozen_rows.get(name), frozen_bands.get(name, 0.0),
            ) if stall_retry else None
            if trigger is not None:
                if retry_budget_s <= 0:
                    entry["retry_skipped"] = True
                    entry["retry_trigger"] = trigger
                else:
                    _, dur2, deltas2 = timed_run(spec)
                    retry_budget_s, over = retry_budget_spend(
                        retry_budget_s, dur2)
                    if over:
                        entry["retry_budget_exhausted_mid"] = True
                        print(f"bench: retry budget exhausted mid-retry "
                              f"({name}: {-retry_budget_s:.1f} s over)",
                              file=sys.stderr)
                    entry["stalled_sec"] = entry["sec"]
                    entry["retry_sec"] = round(dur2, 4)
                    entry["retry_trigger"] = trigger
                    entry.update(
                        {f"retry_{k}": v for k, v in deltas2.items()})
                    # keep policy: see retry_keep (ADVICE r14 — a clean
                    # re-measure replaces the poisoned reading outright;
                    # min-of-two only when the retry is also hot)
                    dur = retry_keep(dur, dur2, deltas2, n_cpus)
                    entry["sec"] = round(dur, 4)
            times[name].append(dur)
            timeline.append(entry)
        # NOTE: no clearCache between sweeps — the frozen baselines were
        # recorded with warm cross-sweep caches (segment cache + library
        # persist pins), and a measured A/B showed per-sweep clearing
        # shifts the whole sweep ~14% colder, which would make medians
        # protocol-incomparable with BENCH_BASELINE.md. Pin accumulation
        # over 3 sweeps is tens of MB (bounded); long-lived servers clear
        # between pipelines instead (see pipeline/dedup.py lifecycle note).

    # Snapshot the steal counter and clock HERE — immediately after the
    # last timed reading, BEFORE the three post-sweep probes (~10+ s of
    # probe execution) — so sweep_steal_share covers exactly the window
    # its comment claims: between the first and last timed reading
    # (ADVICE r14: computing it at JSON-print time folded the probe
    # window into both numerator and denominator).
    sweep_t1 = time.time()
    sweep_hc1 = host_counters()

    from statistics import median

    per_query = {name: round(median(ts), 4) for name, ts in times.items()}
    total = sum(per_query.values())
    scan_after = scan_probe_sec()
    compute_after = compute_probe_sec()
    python_after = python_probe_sec()
    if not gate_applicable:
        phase = "ungated"  # non-protocol config: probe not comparable
    elif not (probe_breaches(scan_before, compute_before, python_before)
              + probe_breaches(scan_after, compute_after, python_after)):
        phase = "ok"
    else:
        phase = "degraded"

    timeline_file = os.environ.get(
        "PYSPARKDB_BENCH_TIMELINE", "bench_timeline_last.json")
    with open(timeline_file, "w") as f:
        json.dump({
            "sweep_start_unix": round(sweep_t0, 3),
            "probes": {
                "scan_before": scan_before, "scan_after": scan_after,
                "compute_before": compute_before,
                "compute_after": compute_after,
                "python_before": python_before,
                "python_after": python_after,
            },
            "timeline": timeline,
        }, f)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    record_json = json.dumps(
            {
                "metric": "pysparkdb headline queries total wall-clock (per-query median)",
                "value": round(total, 4),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "repeats": repeats,
                # host-phase stamps (see empty_job_ms): extra keys, ignored
                # by consumers that only read metric/value/queries
                "empty_job_ms_before": latency_before,
                "empty_job_ms_after": empty_job_ms(),
                # scan-bound throughput stamps (see scan_probe_sec);
                # q6's frozen row is 0.2158 s — readings ≫0.3 s bracket
                # a degraded-throughput phase even when the latency
                # stamps read normal
                "scan_probe_sec_before": scan_before,
                "scan_probe_sec_after": scan_after,
                # compute/shuffle-bound stamps (see compute_probe_sec):
                # frozen row 0.55 s x 2.5 band — these now hold a seat
                # in the gate verdict; quote all three pairs in
                # adjudications
                "compute_probe_sec_before": compute_before,
                "compute_probe_sec_after": compute_after,
                # Python-worker-bound stamps (see python_probe_sec):
                # frozen row 3.2 s x 3.0 band (round-14 amendment) — the
                # sustained max-of-3 body that SEPARATES calm from hot,
                # now holding the third gate seat
                "python_probe_sec_before": python_before,
                "python_probe_sec_after": python_after,
                # the automated phase gate's verdict: "ok" when the scan,
                # compute AND python probes sat within their frozen bands
                # before and after the sweep, "degraded" otherwise — a
                # degraded sweep must not be frozen into BENCH_BASELINE.md
                # (see protocol note there)
                "phase": phase,
                # whole-sweep co-tenant steal share (fraction of the
                # box's cpu-time stolen between the first and last timed
                # reading): the gate probes bracket the sweep but cannot
                # see a hot MIDDLE — this stamp can. Adjudication data,
                # not a gate seat (yet): the r14 sweeps read 313.99 s
                # "ok"-probed with the heat entirely mid-sweep.
                "sweep_steal_share": round(
                    (sweep_hc1.get("steal_jiffies", 0)
                     - sweep_hc0.get("steal_jiffies", 0)) * 0.01
                    / (n_cpus * max(sweep_t1 - sweep_t0, 1e-9)), 4),
                # per-execution timeline sidecar (VERDICT r13 #1)
                "timeline_file": timeline_file,
            }
    )
    print(record_json)
    # Durability mirror (VERDICT r15 task #9): the round-14 driver record
    # was lost to a truncated stdout tail (the ~8 KB one-line JSON cut
    # mid-dict cost the round its round-over-round comparison). Write the
    # SAME line to a sidecar file so a clipped capture is always
    # recoverable. Driver contract untouched: stdout still carries the
    # one-line JSON; the file is an extra artifact.
    json_mirror = os.environ.get("PYSPARKDB_BENCH_JSON", "bench_last.json")
    try:
        with open(json_mirror, "w") as f:
            f.write(record_json + "\n")
    except OSError as exc:
        print(f"bench: JSON mirror not written ({exc})", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
