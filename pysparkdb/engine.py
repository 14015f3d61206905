"""Engine — the client surface.

Reference lifecycle (fpdb-main/src/Client.cpp:94-158): catalog fetch → SQL →
Calcite plan (Thrift/Java) → prephysical plan → physical plan → CAF actor
execution → result TupleSet. In Spark every one of those stages is Catalyst +
the DAG scheduler; the Engine is therefore a thin facade: a SparkSession, a
Catalog of declared tables, ``sql()`` returning a DataFrame, and a DataFrame
handle per table for the operator-builder API (pysparkdb.operators).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession

from pysparkdb.catalog import Catalog
from pysparkdb.session import apply_engine_confs, get_spark

# Serializes SQL-text RESOLUTION (not execution) across threads. Temp views
# are session-global, so the predicate-transfer pass's swap-resolve-restore
# would otherwise race a concurrent sql() resolving against the reduced
# views (the reference runs N concurrent queries against one server —
# fpdb-calcite MultiQueryTest — so the facade must too). Resolution is
# milliseconds; execution of the returned DataFrames proceeds fully in
# parallel, so the lock costs nothing at scale. Module-level on purpose:
# two Engine facades over the same SparkSession share the view namespace,
# so they must share the lock.
_RESOLVE_LOCK = threading.RLock()

# predicate_transfer="auto" enables the pre-pass only when the largest
# joined table's optimizer-estimated bytes exceed this per-core budget —
# the measured crossover (SCALE.md "Measured crossover", scripts/
# pred_transfer_crossover.py): the pass first wins between 9.6M and 19.2M
# replicated lineitem rows on 8 cores ≈ 170-345 MB of plan-stat bytes, so
# ~21-43 MB/core; 40 MB/core sits at the conservative end (auto stays off
# until the win is clear). Plan-stat bytes cost no Spark job to read —
# the reference's stats.json role.
_AUTO_BYTES_PER_CORE = 40 << 20

# The reference's execution-mode axis (fpdb-plan/include/fpdb/plan/Mode.h:
# 13-18, selected by resources/config/exec.conf:4 `MODE=`): PULL_UP moves
# raw data to compute and evaluates everything there; PUSHDOWN_ONLY ships
# filter/project(/partial-agg) to the storage tier; CACHING_ONLY serves hot
# segments from local memory and pulls misses up unpushed; HYBRID routes
# cache hits around a pushdown scan of the misses
# (PrePToS3PTransformer.cpp:309-461). Spark analog per mode:
#   pullup   — scan-level pushdown confs OFF (every row group crosses the
#              storage→compute boundary; filters evaluate in the executor,
#              Spark's column pruning stays — Catalyst cannot un-prune),
#              no cache.
#   pushdown — the engine default (DEFAULT_CONFS): parquet filter/agg
#              pushdown, runtime bloom filters, DPP.
#   caching  — pushdown confs OFF + every attached-table scan routed
#              through the SegmentCacheManager (hits are InMemoryRelation
#              column segments; misses load unpushed and are admitted).
#   hybrid   — pushdown confs ON + cache routing (miss side keeps the
#              pushdown scan).
# Like the reference's MODE, the switch is SESSION-scoped: Spark reads
# these confs when a DataFrame is planned/executed, so the mode in force
# at action time governs — set it, run, read results (exec.conf has the
# same contract: one mode per server process).
MODES = ("pullup", "pushdown", "caching", "hybrid")

_PUSHDOWN_CONFS = (
    "spark.sql.parquet.filterPushdown",
    "spark.sql.parquet.aggregatePushDown",
    "spark.sql.orc.filterPushdown",
    "spark.sql.csv.filterPushdown.enabled",
    "spark.sql.json.filterPushdown.enabled",
    "spark.sql.optimizer.runtime.bloomFilter.enabled",
    "spark.sql.optimizer.dynamicPartitionPruning.enabled",
)


from typing import NamedTuple  # noqa: E402


class _RemoteAttach(NamedTuple):
    """One attach_arrow_s3 / attach_arrow_s3_snapshot registration."""

    files: list[str]   # absolute data-object paths (the attach's plan)
    conf: object       # S3Conf
    df: DataFrame      # the registered plan (identity check for stats)
    nbytes: int | None  # total data bytes, None = unknown (legacy manifest)
    origin: str        # stable identity (prefix / uri@version) for cache keys


class _SnapshotAttach(NamedTuple):
    """One local attach_snapshot registration (manifest-pinned view)."""

    df: DataFrame      # the registered plan (identity check)
    origin: str        # root@vN — stable identity for cache keys


class Engine:
    def __init__(self, spark: SparkSession | None = None, data_dir: str | None = None):
        self.spark = apply_engine_confs(spark or get_spark())
        self.catalog: Catalog | None = None
        self._mode = "pushdown"
        self._segment_cache = None
        # attach_arrow_s3 registry: view name -> _RemoteAttach, so
        # arrow_s3_table_stats can profile an attached view with ZERO
        # further LIST RPCs (the attach's one LIST already named every
        # object). The DataFrame is kept so the stats call can verify the
        # session view still IS the attach's plan — a view replaced by
        # other means would otherwise be profiled against a stale file
        # list. nbytes (total data bytes, from the LIST / the manifest)
        # sizes the table for predicate-transfer ordering and cache
        # admission — a mapInArrow plan's own optimizer stats see only
        # the tiny task list, so without it a 100 TB remote fact table
        # would masquerade as broadcast-small.
        self._arrow_s3_tables: dict[str, _RemoteAttach] = {}
        # attach_snapshot registry: local pinned-version views, kept so
        # the predicate-transfer pass can see them as base tables (their
        # LogicalRelation plans carry real parquet stats, so sizing is
        # the ordinary plan-stat path)
        self._snapshot_tables: dict[str, _SnapshotAttach] = {}
        # per-ENGINE predicate_transfer="auto" crossover (bytes/core):
        # an instance attribute so a caller tuning or force-flipping the
        # threshold (tests, the q5_auto certificate query) affects only
        # its own facade — mutating the module constant would race every
        # concurrent sql() on the session, breaking the documented
        # thread-safety contract
        self.auto_bytes_per_core = _AUTO_BYTES_PER_CORE
        if data_dir is not None:
            self.attach(data_dir)

    @property
    def mode(self) -> str:
        return self._mode

    def set_mode(
        self,
        mode: str,
        cache_capacity_bytes: int | None = None,
        cache_policy: str | None = None,
    ) -> "Engine":
        """Switch the execution mode (see MODES above). Returns self.

        The segment cache survives pullup/pushdown interludes (routing is
        simply bypassed) so a hybrid → pushdown → hybrid sequence keeps
        its hot segments, matching the reference where the cache belongs
        to the server, not the query. Passing explicit cache parameters
        while a cache already exists REBUILDS it (clear + recreate —
        unpersisting its segments), since silently keeping the old
        capacity/policy would drop the caller's request on the floor; a
        partial override (only capacity, or only policy) keeps the other
        parameter from the existing cache. Omit both to keep the cache.
        For the same drop-nothing-on-the-floor reason, cache parameters
        with a non-caching mode are an error, not a silent no-op."""
        if mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
        explicit = cache_capacity_bytes is not None or cache_policy is not None
        if explicit and mode not in ("caching", "hybrid"):
            raise ValueError(
                f"cache parameters apply only to caching/hybrid modes, "
                f"got mode={mode!r}"
            )
        enable = "true" if mode in ("pushdown", "hybrid") else "false"
        for conf in _PUSHDOWN_CONFS:
            self.spark.conf.set(conf, enable)
        if mode in ("caching", "hybrid") and (
            self._segment_cache is None or explicit
        ):
            from pysparkdb.plans.cache import SegmentCacheManager

            old = self._segment_cache
            if old is not None:
                old.clear()
            self._segment_cache = SegmentCacheManager(
                self.spark,
                capacity_bytes=(
                    cache_capacity_bytes
                    if cache_capacity_bytes is not None
                    else (old.capacity if old is not None else 1 << 30)
                ),
                policy=(
                    cache_policy
                    if cache_policy is not None
                    else (old.policy if old is not None else "wlfu")
                ),
            )
        self._mode = mode
        return self

    def clear_segment_cache(self) -> None:
        """Unpersist every cached segment and drop the manager — the
        explicit lifecycle end for caching/hybrid work (benchmarks and
        registered queries MUST call this rather than dropping the Engine,
        or the materialized InMemoryRelations stay pinned in the shared
        session's CacheManager for its remaining lifetime)."""
        if self._segment_cache is not None:
            self._segment_cache.clear()
            self._segment_cache = None

    @staticmethod
    def _strip_fs_scheme(p: str) -> str:
        # file:/x and file:///x both normalize to /x; remote schemes with
        # an authority (s3a://bucket/...) are kept verbatim
        if p.startswith("file:"):
            rest = p[len("file:"):]
            while rest.startswith("//"):
                rest = rest[1:]
            return rest
        return p

    def _leaf_columns_by_table(self, df: DataFrame) -> dict[str, set]:
        """Per attached table, the union of columns the optimized plan's
        leaf scans actually read — the segment working set to route
        through the cache. Plan-walk only (no job). Attribution is by the
        leaf's FILE PATH against the catalog's registered paths, not by
        column-name subset: a pinned snapshot view or any derived frame
        whose output happens to be ⊆ a table's columns must not admit that
        table's segment (it would pin memory the query never reads)."""
        assert self.catalog is not None
        path_to_table = {
            self._strip_fs_scheme(p).rstrip("/"): n
            for n, p in self.catalog.paths.items()
        }
        needed: dict[str, set] = {}
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            try:
                roots = leaf.relation().location().rootPaths()
                root = roots.apply(0).toString() if roots.size() else None
            except Exception:
                # Not a file-source leaf. One case still attributes: an
                # InMemoryRelation Spark's CacheManager substituted for a
                # table scan because an ADMITTED SEGMENT's plan matched it
                # exactly (repeats of a routed query hit this) — its cached
                # physical plan still carries the file scan, so dig the
                # root path out of it; skipping would bypass the routing
                # and the manager's hit accounting on exactly the queries
                # the cache serves best.
                root = self._cached_leaf_root(leaf)
            if root is None:
                continue
            tname = path_to_table.get(self._strip_fs_scheme(root).rstrip("/"))
            if tname is None:
                continue
            out = leaf.output()
            names = {out.apply(j).name() for j in range(out.size())}
            if names:
                needed.setdefault(tname, set()).update(names)
        return needed

    @staticmethod
    def _cached_leaf_root(leaf) -> str | None:
        """First file-scan root path inside an InMemoryRelation leaf's
        cached physical plan, or None for any other leaf kind."""
        try:
            if leaf.getClass().getSimpleName() != "InMemoryRelation":
                return None
            phys = leaf.cachedPlan().collectLeaves()
            for j in range(phys.size()):
                try:
                    roots = phys.apply(j).relation().location().rootPaths()
                    if roots.size():
                        return roots.apply(0).toString()
                except Exception:
                    continue
        except Exception:
            return None
        return None

    def attach(
        self, data_dir: str, validate: bool = True, reuse: bool = False
    ) -> "Engine":
        """Register every known table under ``data_dir`` as a temp view.

        Equivalent of Client::getCatalogueEntry (Client.cpp:118-132) — the
        declared schemas come from pysparkdb.catalog.DECLARED_SCHEMAS.

        ``reuse=True`` adopts the process-wide per-(session, data_dir)
        catalog (pysparkdb.catalog.cached_catalog) instead of re-reading
        ten parquet footers per attach — measured ~0.8-1 s per call, the
        dominant slice of every Engine-constructing certificate query
        (r15 optimization). Opt-in because the cached catalog pins the
        directory's file list from first registration: pass it only for
        immutable directories (the benchmark datasets); an attach after
        rewriting ``data_dir`` must keep the default rebuild."""
        if reuse:
            from pysparkdb.catalog import cached_catalog

            self.catalog = cached_catalog(self.spark, data_dir)
        else:
            self.catalog = Catalog(self.spark, data_dir).register_all(
                validate=validate)
        return self

    def sql(
        self,
        query: str,
        predicate_transfer: bool | str = False,
        args: dict | list | None = None,
        mode: str | None = None,
    ) -> DataFrame:
        """SQL → DataFrame (Client::executeQuery analog; lazy, not collected).

        ``args`` are bound parameters — named (``:name`` markers with a
        dict) or positional (``?`` markers with a list) — resolved by
        Spark's parameterized-SQL binder, NOT string interpolation: values
        bind as typed literals after parsing, so a client-supplied string
        can never splice into the query text (the injection-safety a
        SQL-serving endpoint needs; beyond the reference, whose Calcite
        front door takes only literal SQL).

        ``predicate_transfer=True`` applies the reference's CIDR-2024
        pre-pass (PrePToPTransformerForPredTrans.cpp, enabled by its
        exec.conf PRED_TRANS flag): the join graph is extracted from the
        query's own analyzed plan (JoinOriginTracer analog), every
        attached table is semi-join-reduced across it, and the SAME query
        text is re-resolved against the reduced relations. Purity
        invariant: semi joins only remove rows that cannot survive the
        query's own joins, so results are identical (engine-level test in
        tests/test_plans.py). Worth turning on for multi-hop-selective
        join queries; the pass costs one broadcast semi join per edge —
        see SCALE.md for the measured crossover.

        ``predicate_transfer="auto"`` makes that call cost-based: the pass
        runs only when the largest joined table's plan-stat size clears
        the measured per-core crossover (``_AUTO_BYTES_PER_CORE`` ×
        defaultParallelism), so small/interactive queries keep the plain
        plan and shuffle-dominated fact queries get the reduction — the
        third mode the reference lacks (its PRED_TRANS flag is all-or-
        nothing per server config).

        ``mode`` switches the execution mode for THIS and subsequent calls
        (``set_mode`` semantics — session-scoped, like the reference's
        exec.conf MODE): in ``"caching"``/``"hybrid"`` the attached-table
        scans are routed through the SegmentCacheManager (each table's
        optimizer-pruned column working set becomes a cached segment;
        repeat queries over ⊆ columns serve from memory), in ``"pullup"``
        the scan-pushdown confs are disabled. Cache routing applies to the
        plain resolution path; when ``predicate_transfer`` is also set the
        transfer pass wins and routing is skipped (caching semi-join-
        reduced relations would poison the segment keys).

        Thread-safe: concurrent ``sql()`` calls (either mode, any Engine
        over this session) are safe — resolution is serialized under
        ``_RESOLVE_LOCK`` so the transfer pass's view swap can never leak
        into another call's analysis; execution parallelism is untouched
        (the lock is released before any job runs)."""
        if mode is not None:
            # always re-apply, even when mode == self._mode: the confs are
            # SESSION-global and another Engine over this session (whose
            # __init__ re-applies the pushdown defaults) may have reset
            # them since; set_mode is idempotent and costs a few conf sets
            self.set_mode(mode)
        if isinstance(predicate_transfer, str) and predicate_transfer != "auto":
            # a typo'd mode string must not silently pay the full
            # unconditional pass (the regression auto exists to prevent)
            raise ValueError(
                f"predicate_transfer must be True, False or 'auto', "
                f"got {predicate_transfer!r}"
            )
        with _RESOLVE_LOCK:
            df = self.spark.sql(query, args=args) if args else self.spark.sql(query)
        if not predicate_transfer:
            if self._mode in ("caching", "hybrid") and (
                self.catalog is not None or self._arrow_s3_tables
                or self._snapshot_tables
            ):
                return self._route_views_through_cache(df, query, args)
            return df
        # The transferable table universe: the local catalog, local
        # pinned-snapshot views, and every remote-attached view
        # (attach_arrow_s3 / attach_arrow_s3_snapshot) — the reference
        # applies its pre-pass to S3-backed tables in the first place,
        # so the remote tier must be eligible here too. Identical
        # schemas across any two entries fall to extract_join_edges'
        # ambiguity exclusion (no edge, never a wrong reduction).
        base_tables: dict[str, DataFrame] = dict(
            self.catalog.tables) if self.catalog is not None else {}
        for sname, satt in self._live_attached(self._snapshot_tables).items():
            base_tables[sname] = satt.df
        live_remote = self._live_attached(self._arrow_s3_tables)
        for rname, att in live_remote.items():
            base_tables[rname] = att.df
        assert base_tables, "attach a data_dir or remote tables first"
        from pysparkdb.plans.predicate_transfer import (
            _plan_bytes,
            extract_join_edges,
            predicate_transfer as _transfer,
        )

        edges = extract_join_edges(df, base_tables)
        if not edges:
            return df
        edge_tables = {e.left for e in edges} | {e.right for e in edges}
        # Sizing: local tables read optimizer plan stats (parquet footers,
        # free); remote mapInArrow plans' stats see only the task list, so
        # their size is the attach-recorded byte total — unknown (legacy
        # manifest without "bytes") means ∞: the table still RECEIVES
        # reductions but is never trusted as broadcast-small, the only
        # safe default for what may be a 100 TB corpus. Keyed on the
        # LIVE-filtered attach set (the same dict base_tables was built
        # from), not the raw registry: a name once attached remotely but
        # since re-registered as a catalog/snapshot table must be sized
        # by ITS plan stats, not the stale attach's byte total.
        sizes = {
            n: (
                (live_remote[n].nbytes
                 if live_remote[n].nbytes is not None
                 else float("inf"))
                if n in live_remote
                else _plan_bytes(base_tables[n])
            )
            for n in edge_tables
        }
        if predicate_transfer == "auto":
            cores = self.spark.sparkContext.defaultParallelism
            if max(sizes.values()) < self.auto_bytes_per_core * cores:
                return df  # below the measured crossover: plain plan wins
        reduced = _transfer(base_tables, edges, sizes=sizes)
        # Re-resolve the same text against the reduced relations: temp views
        # are swapped only while spark.sql() analyzes the string (resolution
        # happens at creation; the returned DataFrame keeps its plan), then
        # restored — atomically w.r.t. every other sql() resolution.
        with _RESOLVE_LOCK:
            try:
                for name, rdf in reduced.items():
                    rdf.createOrReplaceTempView(name)
                return (self.spark.sql(query, args=args) if args
                        else self.spark.sql(query))
            finally:
                for name, odf in base_tables.items():
                    odf.createOrReplaceTempView(name)

    def _live_attached(self, registry: dict) -> dict:
        """Filter an attach registry down to names whose CURRENT session
        view still IS the registered plan. A view replaced or dropped by
        other means must neither be swapped (wrong data under the name)
        nor restored (the finally block would silently resurrect it) —
        the same staleness rule arrow_s3_table_stats enforces."""
        out = {}
        for name, val in registry.items():
            rdf = getattr(val, "df", val)
            try:
                if self.spark.table(name).sameSemantics(rdf):
                    out[name] = val
            except Exception:
                continue
        return out

    def _attached_view_columns(
        self, df: DataFrame, names
    ) -> dict[str, set]:
        """Per attached view (any name in ``names``), the columns THIS
        query actually references — the working set the segment cache
        routes for remote attaches AND local snapshot pins. The catalog
        tables' plan-walk (leaf file paths against catalog paths) cannot
        attribute a mapInArrow scan (whose leaf is the task list) nor a
        manifest-pinned view (whose leaf paths are the manifest's file
        list, not the catalog dir); here attribution is by VIEW NAME on
        the ANALYZED plan (resolved temp views keep their SubqueryAlias
        wrapper there), and the working set is the view-output attributes
        whose exprIds any operator references (or the query returns)."""
        analyzed = df._jdf.queryExecution().analyzed()
        used_ids: set[int] = set()
        out = analyzed.output()
        for i in range(out.size()):
            used_ids.add(out.apply(i).exprId().id())
        per_view: dict[str, list[tuple[str, int]]] = {}

        def walk(node):
            refs = node.references().iterator()
            while refs.hasNext():
                used_ids.add(refs.next().exprId().id())
            if node.getClass().getSimpleName() == "SubqueryAlias":
                name = node.alias()
                if name in names:
                    o = node.output()
                    per_view.setdefault(name, []).extend(
                        (o.apply(i).name(), o.apply(i).exprId().id())
                        for i in range(o.size()))
            for i in range(node.children().size()):
                walk(node.children().apply(i))

        walk(analyzed)
        return {
            name: {c for c, eid in pairs if eid in used_ids}
            for name, pairs in per_view.items()
        }

    def _route_views_through_cache(
        self, df: DataFrame, query: str, args: dict | list | None
    ) -> DataFrame:
        """CACHING_ONLY / HYBRID scan routing (CacheLoadPOp.cpp analog):
        swap each attached table's view for its SegmentCacheManager
        projection over the columns THIS query's optimized plan reads,
        re-resolve the same text, restore the views — the predicate-
        transfer view-swap pattern, under the same resolution lock. A
        first-seen working set admits (miss: the load obeys the session's
        pushdown confs — off in caching mode, on in hybrid); repeats and
        subset requests serve from the InMemoryRelation.

        Remote-attached views (attach_arrow_s3 / attach_arrow_s3_snapshot)
        route through the SAME cache — the reference's hybrid economics
        (hot columns cached compute-side, cold pushed to storage:
        PrePToS3PTransformer.cpp:309-461) apply to actual remote data,
        which is where a segment cache pays for itself at 100 TB: a
        cached segment turns repeat object-store GET + decode into an
        in-memory columnar read. Admission is sized by the attach's
        recorded byte total prorated to the working set (a mapInArrow
        plan's own stats see only the task list); a legacy attach with
        UNKNOWN bytes is served uncached rather than admitted blind —
        an unsized admission could pin a corpus-scale segment."""
        assert self._segment_cache is not None
        needed = (self._leaf_columns_by_table(df)
                  if self.catalog is not None else {})
        data_dir = self.catalog.data_dir if self.catalog is not None else ""
        # Project in each table's DECLARED column order (cache identity is
        # canonicalized inside project(), which sorts its key): a sorted
        # projection would make SELECT * return alphabetized columns in
        # caching/hybrid modes — the mode axis must never change a result,
        # including schema order.
        routed = {
            name: self._segment_cache.project(
                self.catalog.tables[name],
                f"{name}@{data_dir}",
                [c for c in self.catalog.tables[name].columns if c in cols],
            )
            for name, cols in needed.items()
        }
        live_remote = self._live_attached(self._arrow_s3_tables)
        live_snap = self._live_attached(self._snapshot_tables)
        attached_cols = self._attached_view_columns(
            df, set(live_remote) | set(live_snap))
        for name, cols in attached_cols.items():
            att = live_remote.get(name)
            if att is not None:
                if not cols or att.nbytes is None or not att.files:
                    # unsized or empty attach: plain plan
                    continue
                want = [c for c in att.df.columns if c in cols]
                routed[name] = self._segment_cache.project(
                    att.df, f"{name}@{att.origin}", want,
                    size_hint=max(
                        1,
                        att.nbytes * len(want) // max(len(att.df.columns), 1)
                    ),
                )
                continue
            # local attach_snapshot pin: same view-name attribution; its
            # plan is an ordinary parquet read over the manifest's file
            # list, so plan-stat sizing applies (no size_hint needed) —
            # the local/remote parity the mode-axis matrix promises
            satt = live_snap[name]
            if not cols:
                continue
            want = [c for c in satt.df.columns if c in cols]
            routed[name] = self._segment_cache.project(
                satt.df, f"{name}@{satt.origin}", want)
        if not routed:
            return df
        from pyspark.errors import AnalysisException

        restore = {n: self.catalog.tables[n] for n in needed} if needed else {}
        for name in routed:
            if name in restore:
                continue
            restore[name] = (live_remote[name].df if name in live_remote
                             else live_snap[name].df)
        with _RESOLVE_LOCK:
            try:
                for name, rdf in routed.items():
                    rdf.createOrReplaceTempView(name)
                return (self.spark.sql(query, args=args) if args
                        else self.spark.sql(query))
            except AnalysisException:
                # The working set came from the OPTIMIZED plan; in rare
                # shapes the optimizer prunes a column the raw text still
                # references at analysis (a folded `true OR col > 0`
                # predicate, an eliminated join), so re-resolution against
                # the narrower views fails. Serve the plain plan — the
                # cache is an optimization, never a correctness gate.
                return df
            finally:
                for name, odf in restore.items():
                    odf.createOrReplaceTempView(name)

    def table(self, name: str) -> DataFrame:
        assert self.catalog is not None, "call attach(data_dir) first"
        return self.catalog.table(name)

    def attach_snapshot(
        self, name: str, root: str, version: int | str | None = None,
        replace: bool = False,
    ) -> DataFrame:
        """Register a snapshot-versioned dataset (sources/versioned.py) as
        a queryable view — time travel through the same SQL front door:
        ``engine.attach_snapshot("docs", root, version=3)`` then
        ``engine.sql("SELECT ... FROM docs")`` reads exactly version 3's
        manifest, frozen while ingest appends new versions. Shadowing an
        already-registered view refuses without ``replace=True`` — the
        same session-catalog guard as attach_arrow_s3: silently
        repointing every registered query at the snapshot is the exact
        suite-poisoning bug the guard exists for (re-pinning the same
        name at another version is the legitimate replace=True case)."""
        from pysparkdb.sources.versioned import snapshot_read

        if not replace and self.spark.catalog.tableExists(name):
            raise ValueError(
                f"attach_snapshot({name!r}) would replace an "
                f"already-registered view; pass replace=True to do this "
                f"deliberately (no view was touched)")
        # Resolve the pinned version (tag name / None-latest -> int)
        # BEFORE reading, and read at the resolved int: resolving after
        # snapshot_read would let a concurrent append (or tag move)
        # between the two calls record origin root@vN+1 while the
        # registered df actually reads vN — in caching/hybrid mode a
        # later pin at the real vN+1 could then share cached segments
        # with this stale view. Resolving first guarantees the df and
        # its cache-identity origin name the same version (two pins of
        # the same root at different versions must never share a
        # cached segment).
        from pysparkdb.sources.versioned import (
            _resolve_version,
            snapshot_versions,
        )

        resolved = _resolve_version(root, version)
        if resolved is None:
            versions = snapshot_versions(root)
            if not versions:
                raise ValueError(
                    f"no snapshot versions committed under {root!r}")
            resolved = versions[-1]
        df = snapshot_read(self.spark, root, resolved)
        df.createOrReplaceTempView(name)
        self._snapshot_tables[name] = _SnapshotAttach(
            df, f"{root}@v{resolved}")
        return df

    def attach_arrow_s3_snapshot(
        self, name: str, uri: str, conf, version: int | str | None = None,
        replace: bool = False,
    ) -> DataFrame:
        """Register an object-store manifest snapshot as a queryable view
        pinned at ``version`` (default latest) — the remote twin of
        ``attach_snapshot``, completing the reproducible-training-
        snapshot workflow for remote corpora at the engine front door:
        ``engine.attach_arrow_s3_snapshot("docs", root, conf, version=3)``
        then ``engine.sql("SELECT ... FROM docs")`` reads exactly version
        3's manifest, frozen while ingest appends new versions. Planning
        is the manifest's EXPLICIT file list (no LIST over the data
        prefix, no eventual-consistency window), and the same list is
        recorded for ``arrow_s3_table_stats`` so the footer-stats
        profile of the pinned view issues zero further LISTs. A version
        whose manifest lists NO objects (an all-rows-erased
        ``arrow_s3_snapshot_rewrite`` — the erasure terminal state)
        registers as the EMPTY view under its committed schema, exactly
        as ``arrow_s3_snapshot_read`` reads it: the engine front door
        must be able to pin what the read path can read. Shadowing an
        already-registered view refuses without ``replace=True``,
        exactly as attach_arrow_s3."""
        import json as _json

        from pyspark.sql import types as T

        from pysparkdb.sources.arrow_s3 import (
            _read_parquet_files,
            _snapshot_manifest_files,
        )

        if not replace and self.spark.catalog.tableExists(name):
            raise ValueError(
                f"attach_arrow_s3_snapshot({name!r}) would replace an "
                f"already-registered view; pass replace=True to do this "
                f"deliberately (no view was touched)")
        _version, files, manifest = _snapshot_manifest_files(
            conf, uri, version)
        if files:
            df = _read_parquet_files(self.spark, files, conf)
        else:
            schema_json = manifest.get("schema")
            if schema_json is None:
                raise ValueError(
                    f"version {_version} is empty and predates schema "
                    f"recording — nothing to reconstruct a view from")
            from pysparkdb.sources.versioned import empty_frame

            df = empty_frame(
                self.spark, T.StructType.fromJson(_json.loads(schema_json)))
        df.createOrReplaceTempView(name)
        self._arrow_s3_tables[name] = _RemoteAttach(
            files, conf, df, manifest.get("bytes"), f"{uri}@v{_version}")
        return df

    def attach_arrow_s3(
        self, prefix: str, conf, replace: bool = False
    ) -> dict[str, DataFrame]:
        """Register every parquet table under an object-store prefix as a
        temp view through the JAR-LESS arrow_s3 scan path — the
        Client::getCatalogueEntry front door for environments without the
        hadoop-aws jars (sources/arrow_s3.py; the s3a path uses
        ``attach()`` on an s3a:// URI instead). Discovery is ONE LIST —
        literally: the listing's paths group by their first segment under
        the prefix (``<prefix>/<table>.parquet/part-*.parquet`` layouts
        and single ``<prefix>/<table>.parquet`` objects both resolve to
        view ``<table>``) and each table's reader plans that EXPLICIT
        file list, so attach issues no per-table re-LIST (at N tables on
        real S3 that is N billable round-trips saved). A name backed by
        TWO DISTINCT physical segments raises — whether flat-vs-dir
        (``nation.parquet`` object next to ``nation/`` directory) or
        dir-vs-dir (``nation/`` next to ``nation.parquet/``): silently
        unioning two layouts' files into one view is the partial-/mixed-
        data bug this guard exists for. The SAME principle extends to
        the session catalog: a derived name that would shadow an
        ALREADY-REGISTERED view (a local table attached via
        ``attach()``, an earlier snapshot pin, anything) raises before
        any view is touched — silently repointing every registered
        query at the remote store is a worse bug than the intra-attach
        merge. Pass ``replace=True`` to clobber deliberately (e.g. a
        re-attach of the same prefix to refresh the file list). Returns
        {table: DataFrame}. After this, ``engine.sql()`` runs the full
        registered query surface against the remote store —
        executor-side GETs, pruned decode."""
        from pysparkdb.sources.arrow_s3 import (
            _read_parquet_files,
            _strip_scheme,
            arrow_s3_list,
        )

        base = _strip_scheme(prefix).rstrip("/")
        groups: dict[str, list[str]] = {}
        # The collision key is the PHYSICAL first segment (+ flat/dir
        # shape), not just the derived view name: <prefix>/nation/ and
        # <prefix>/nation.parquet/ are distinct directories that both
        # derive view 'nation' — keying on name alone would silently
        # union their files into one view (late schema errors, or worse,
        # a same-schema wrong-rows merge).
        origins: dict[str, tuple[str, str]] = {}
        sizes: dict[str, int] = {}
        for path, sz in arrow_s3_list(conf, base):
            rel = path[len(base) + 1:]
            seg = rel.split("/", 1)[0]
            name = seg.removesuffix(".parquet")
            shape = "dir" if "/" in rel else "flat"
            origin = (seg, shape)
            if origins.setdefault(name, origin) != origin:
                prev_seg, prev_shape = origins[name]
                raise ValueError(
                    f"table name {name!r} is backed by two distinct "
                    f"layouts under {prefix!r}: "
                    f"{prev_seg!r} ({prev_shape}) and {seg!r} ({shape}); "
                    f"attach would silently merge their files into one "
                    f"view — rename one")
            groups.setdefault(name, []).append(path)
            sizes[name] = sizes.get(name, 0) + sz
        if not replace:
            shadowed = sorted(
                n for n in groups if self.spark.catalog.tableExists(n))
            if shadowed:
                raise ValueError(
                    f"attach_arrow_s3({prefix!r}) would replace "
                    f"already-registered view(s) {shadowed} — every query "
                    f"resolving those names would silently repoint at the "
                    f"remote store; pass replace=True to do this "
                    f"deliberately (no view was touched)")
        out: dict[str, DataFrame] = {}
        for name, files in sorted(groups.items()):
            df = _read_parquet_files(self.spark, sorted(files), conf)
            df.createOrReplaceTempView(name)
            self._arrow_s3_tables[name] = _RemoteAttach(
                sorted(files), conf, df, sizes[name], f"{prefix}/{name}")
            out[name] = df
        return out

    def arrow_s3_table_stats(
        self, name: str, columns=None, assume_no_nan: bool = False
    ) -> DataFrame:
        """COUNT/MIN/MAX/null-count over an attached remote view answered
        from parquet FOOTER statistics — zero data-page GETs and zero
        further LIST RPCs (the attach's one LIST already named every
        object; this plans exactly that file list). The engine front
        door for the profile pass a user runs before touching a remote
        corpus — the client-side twin of the reference's storage-side
        separable aggregate (SeparableTraits.cpp:13-36) on the jar-less
        tier; the DSv2/s3a tier gets the same via Spark's own
        PushedAggregation (op_agg_pushdown). Returns the one-row frame
        arrow_s3_scan_stats documents, with its per-column exactness
        rules (no filters; string/binary, ns-timestamp and — unless
        ``assume_no_nan`` — float/double columns get rows+nulls only,
        their min/max omitted)."""
        if name not in self._arrow_s3_tables:
            raise KeyError(
                f"{name!r} is not an attach_arrow_s3 view on this engine "
                f"(attached: {sorted(self._arrow_s3_tables) or 'none'})")
        from pysparkdb.sources.arrow_s3 import _scan_stats_files

        files, conf, attached_df = self._arrow_s3_tables[name][:3]
        # the file list certifies the ATTACHED plan; if the session view
        # was replaced since (another attach, createOrReplaceTempView by
        # other means, a dropped-and-recreated table), profiling the old
        # list would report stats for objects that no longer back the
        # name — stale answers dressed as certified ones, so refuse
        try:
            current = self.spark.table(name)
            same = current.sameSemantics(attached_df)
        except Exception:
            same = False
        if not same:
            raise KeyError(
                f"view {name!r} no longer resolves to the plan "
                f"attach_arrow_s3 registered (it was replaced or dropped "
                f"since) — re-attach before profiling")
        if not files:
            # an all-rows-erased pinned version: the profile is exact by
            # construction (0 rows, 0 nulls, NULL min/max) and costs zero
            # GETs — same column shape as the footer path, so a caller
            # profiling the same table across the erasure terminal state
            # reads one schema. Eligibility mirrors the footer path's
            # _stats_minmax_eligible over the attached schema's arrow
            # types (string/binary and — unless assume_no_nan —
            # float/double get rows+nulls only). One honest caveat: the
            # attached schema is Spark-side (timestamps are µs), so a
            # source column that WAS ns-timestamp parquet — which the
            # footer path refuses min/max for — is indistinguishable once
            # every file is erased; its NULL min/max here certify the
            # attached view's type, which is all that remains.
            from pyspark.sql import functions as F
            from pyspark.sql.pandas.types import to_arrow_type

            from pysparkdb.sources.arrow_s3 import _stats_minmax_eligible

            fields = {f.name: f.dataType for f in attached_df.schema.fields}
            bad = [c for c in (columns or []) if c not in fields]
            if bad:
                raise ValueError(f"column {bad[0]!r} not in parquet schema")
            sel = [F.lit(0).cast("long").alias("rows")]
            for c in (columns or []):
                t = fields[c]
                if _stats_minmax_eligible(
                        to_arrow_type(t), assume_no_nan) is None:
                    sel += [F.lit(None).cast(t).alias(f"{c}_min"),
                            F.lit(None).cast(t).alias(f"{c}_max")]
                sel.append(F.lit(0).cast("long").alias(f"{c}_nulls"))
            return self.spark.range(1).select(*sel)
        return _scan_stats_files(
            self.spark, files, conf, columns=columns,
            assume_no_nan=assume_no_nan)

    def register_function(
        self, name, fn, return_type, vectorized: bool = True, replace: bool = False
    ):
        """Register a user-defined scalar function for use in ``sql()`` —
        the UDF surface the reference lacks entirely (SURVEY §2.10: Calcite
        would not serialize one). Deliberately the LAST resort: everything
        in this engine's own registry compiles to built-in Catalyst
        expressions, and the docstring contract is that a UDF enters a
        query only when no built-in composition can express the semantics.

        ``vectorized=True`` (the default, and the only shape that belongs
        anywhere near a hot path) wraps ``fn`` as an Arrow-batched pandas
        UDF: ``fn`` receives and returns ``pandas.Series``, amortizing the
        Python boundary over whole record batches (~10-100× the
        row-at-a-time form). ``vectorized=False`` registers the plain
        row-at-a-time Python UDF for quick non-performance-critical glue.
        Either way the function becomes callable from SQL text AND from
        the returned Column-producing handle.

        At 100 TB: a pandas UDF still serializes every batch across the
        JVM↔Python boundary — scan-dominant stages should stay built-in;
        reserve this for genuinely opaque logic (model scoring, custom
        codecs) and budget the extra cores Python workers occupy.

        Name collisions raise: ``spark.udf.register`` would silently
        shadow a Spark built-in (a UDF named ``abs`` hijacks every
        subsequent ``sql()`` on the shared session) or clobber a prior
        registration. Pass ``replace=True`` to overwrite deliberately
        (re-registering the same logical function across engine
        restarts is the legitimate case)."""
        if not replace and self.spark.catalog.functionExists(name):
            raise ValueError(
                f"function {name!r} already exists (Spark built-in or prior "
                f"registration) and would be silently shadowed session-wide; "
                f"pass replace=True to overwrite deliberately"
            )
        if vectorized:
            from pyspark.sql.functions import pandas_udf

            udf = pandas_udf(fn, return_type)
        else:
            from pyspark.sql.functions import udf as _udf

            udf = _udf(fn, return_type)
        self.spark.udf.register(name, udf)
        return udf

    def analyze_tables(self) -> None:
        """Collect table/column stats so Catalyst CBO can reorder joins —
        the role of the reference's stats.json + Calcite row-count metadata
        (fpdb-calcite/.../metadata/FPDBRelMdRowCount.java).

        Only applies when tables are persisted in a real metastore; temp
        views cannot be ANALYZEd, so this is best-effort (AQE provides
        runtime stats regardless).
        """
        assert self.catalog is not None
        for name in self.catalog.tables:
            try:
                self.spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
            except Exception:
                pass

    def explain(self, query_or_df, mode: str = "formatted") -> str:
        """Physical-plan text for a SQL string or DataFrame — the
        SHOW_OP_TIMES-style introspection surface (exec.conf:7-8)."""
        from pysparkdb.plans.pushdown import explain_str

        df = self.sql(query_or_df) if isinstance(query_or_df, str) else query_or_df
        return explain_str(df, mode)

    def scan_audit(self, query_or_df) -> dict:
        """Scan-efficiency audit before running at scale: filters that
        reached the scan, columns actually read, codegen stage count —
        the SHOW_SCAN_METRICS analog (bytes-read evidence lives in the
        same plan nodes)."""
        from pysparkdb.plans.pushdown import (
            codegen_stage_count,
            pushed_filters,
            read_schema,
        )

        df = self.sql(query_or_df) if isinstance(query_or_df, str) else query_or_df
        return {
            "pushed_filters": pushed_filters(df),
            "read_columns": read_schema(df),
            "codegen_stages": codegen_stage_count(df),
        }
