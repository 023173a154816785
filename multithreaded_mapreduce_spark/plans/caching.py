"""Cache hygiene for builder-internal ``persist()`` calls.

Several builders persist a shared intermediate relation so that
multiple consuming branches don't re-derive it (the round-3
branch-recomputation fixes: triangle counting, PMI, basket lift, LSH
collapse, pagerank edges, …). A builder cannot unpersist that relation
itself — the caller runs the action, and the cache must live until the
action completes. Left alone, though, every builder invocation leaks a
CacheManager entry that survives until session stop, so a long-lived
session sweeping the catalog accumulates hundreds of cached relations
(VERDICT r3 task 4 / ADVICE r3).

Contract implemented here:

- builders persist through :func:`tracked_persist`, which records the
  DataFrame in a session-global ledger;
- the registry wraps every registered builder so that each TOP-LEVEL
  builder invocation first releases the ledger — the previous query's
  action has necessarily been taken (or abandoned) by the time the
  caller asks for the next plan, so its caches are dead weight. Nested
  builder-in-builder composition goes through the raw module-level
  functions, never the registry wrapper, so a release can never fire
  mid-build;
- action-side harnesses (bench.py, scripts/plan_audit.py, the oracle
  gate) call :func:`release_tracked` explicitly after their action so
  no persisted relation outlives its query even without a next build.

The worst-case cache residency is therefore ONE query's intermediates,
regardless of session lifetime.

Contract caveat: releasing a localCheckpoint's blocks makes any
DataFrame built on it non-recomputable (localCheckpoint truncates
lineage by design), so a PREVIOUS query's returned DataFrame must not
be re-collected after the next top-level build starts — rebuild it
through the registry instead. That is exactly how the driver, bench,
oracle gate, and tests consume the catalog.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []
#: (SparkSession, rdd_id) pairs for localCheckpoint block caches, which
#: live OUTSIDE the CacheManager and need RDD-level unpersist
_TRACKED_RDD_IDS: list[tuple[object, int]] = []
#: bumped on every release — checkpoint-backed result guards compare it
_EPOCH = 0


# Subclass the CLASSIC DataFrame: the pyspark.sql.DataFrame dispatcher's
# __new__ ignores cls (returns a plain classic instance), so a guard
# subclassed from the dispatcher would silently degrade to an unguarded
# frame. This engine runs classic (JVM) sessions by design.
from pyspark.sql.classic.dataframe import DataFrame as _ClassicDataFrame  # noqa: E402


class CheckpointBackedDataFrame(_ClassicDataFrame):
    """Result frame whose plan reads tracked localCheckpoint blocks
    (the iterative builders: connected components, pagerank).

    localCheckpoint truncates lineage by design, so once
    :func:`release_tracked` drops those blocks — which the registry
    wrapper does at the next top-level build — the plan is
    NON-RECOMPUTABLE and a late action dies with a cryptic executor
    missing-block error far from its cause (ADVICE r5). This subclass
    fails fast at the driver instead, naming the contract. Actions on a
    LIVE epoch pass straight through; transformations return plain
    DataFrames (a derived plan collected late still hits the raw Spark
    error — the guard covers the documented misuse: re-collecting the
    returned handle after the next build)."""

    def __new__(cls, df: DataFrame, epoch: int):
        # bypass the classic __new__ (which re-invokes __init__ with its
        # own (jdf, session) signature) — plain allocation, normal init
        return object.__new__(cls)

    def __init__(self, df: DataFrame, epoch: int):
        super().__init__(df._jdf, df.sparkSession)
        self._mmr_epoch = epoch

    def _mmr_check(self) -> None:
        if self._mmr_epoch != _EPOCH:
            raise RuntimeError(
                "stale checkpoint-backed result: this DataFrame was built on "
                "localCheckpoint blocks that release_tracked() has since "
                "dropped (the next top-level registry build releases the "
                "previous query's caches — see plans/caching.py). Rebuild "
                "the query through the registry instead of re-collecting an "
                "old handle."
            )

    def collect(self):
        self._mmr_check()
        return super().collect()

    def count(self):
        self._mmr_check()
        return super().count()

    def toPandas(self):
        self._mmr_check()
        return super().toPandas()

    def show(self, *a, **k):
        self._mmr_check()
        return super().show(*a, **k)

    def take(self, num):
        self._mmr_check()
        return super().take(num)

    def head(self, n=None):
        self._mmr_check()
        return super().head(n)

    def first(self):
        self._mmr_check()
        return super().first()

    def toLocalIterator(self, *a, **k):
        self._mmr_check()
        return super().toLocalIterator(*a, **k)

    def isEmpty(self):
        self._mmr_check()
        return super().isEmpty()

    def foreach(self, f):
        self._mmr_check()
        return super().foreach(f)

    def foreachPartition(self, f):
        self._mmr_check()
        return super().foreachPartition(f)

    def toJSON(self, use_unicode=True):
        self._mmr_check()
        return super().toJSON(use_unicode)

    def writeTo(self, table):
        self._mmr_check()
        return super().writeTo(table)

    @property
    def rdd(self):
        self._mmr_check()
        return super().rdd

    @property
    def write(self):
        self._mmr_check()
        return super().write


def guard_checkpoint_result(df: DataFrame) -> DataFrame:
    """Wrap a builder's returned frame when its plan depends on tracked
    localCheckpoint blocks, so stale-handle misuse fails with an
    explanatory driver-side error instead of a missing-block crash."""
    return CheckpointBackedDataFrame(df, _EPOCH)


def _persistent_rdd_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in jmap.keySet().toArray()}


def tracked_persist(df: DataFrame, level: Optional[StorageLevel] = None) -> DataFrame:
    """``df.persist()`` + enrol the relation for later release."""
    out = df.persist(level) if level is not None else df.persist()
    _TRACKED.append(out)
    return out


def tracked_local_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint()`` + enrol its cached RDD blocks.

    localCheckpoint materializes into RDD block caches that the
    CacheManager doesn't know about — DataFrame.unpersist can't reach
    them, and they otherwise live until the ContextCleaner happens to
    GC the RDD. The ids are diffed around the checkpoint call (builders
    are single-threaded, so the diff is exactly this checkpoint's)."""
    spark = df.sparkSession
    before = _persistent_rdd_ids(spark)
    out = df.localCheckpoint(eager=eager)
    for rid in _persistent_rdd_ids(spark) - before:
        _TRACKED_RDD_IDS.append((spark, rid))
    return out


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked relation; returns how many were released.

    Safe to call at any top-of-build or post-action point: unpersisting
    an already-unpersisted or stopped-session DataFrame is a no-op /
    swallowed error.
    """
    global _EPOCH
    _EPOCH += 1
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass  # session stopped or cache already evicted
    while _TRACKED_RDD_IDS:
        spark, rid = _TRACKED_RDD_IDS.pop()
        try:
            jrdd = spark.sparkContext._jsc.getPersistentRDDs().get(rid)
            if jrdd is not None:
                jrdd.unpersist(blocking)
                n += 1
        except Exception:
            pass
    return n


def tracked_count() -> int:
    return len(_TRACKED) + len(_TRACKED_RDD_IDS)


# --------------------------------------------------------------------------
# Named result memos (VERDICT r6 task 5)
# --------------------------------------------------------------------------

#: name -> (key, checkpointed result frame, its RDD block ids). Result
#: memos live OUTSIDE the release ledger on purpose: the jaccard
#: connected-components labels are consumed by THREE top-level queries
#: (dedup_components, cluster_aware_split, dedup_cluster_keep_best),
#: and the per-build release_tracked() would otherwise force each to
#: recompute the full CC pass. Residency stays bounded: exactly one
#: checkpoint per memo name (a key change evicts the stale entry), and
#: the relation memoized is the label mapping — two ids per document —
#: never text or pair edges. At cluster scale the same memo would be a
#: reliable checkpoint (HDFS/S3) instead of executor-local blocks so an
#: executor loss can't invalidate it.
_RESULT_MEMO: dict[str, tuple[str, DataFrame, list[tuple[object, int]]]] = {}
#: per-name hit/miss counters for the bench decision stamp
_MEMO_STATS: dict[str, dict] = {}


def _memo_session_state(df: DataFrame) -> str:
    """Classify a memo hit's owning session: ``"ok"`` (the process's
    active session — safe to serve), ``"stale"`` (alive but not the
    active session, e.g. a second concurrent session or a thread where
    the thread-scoped ``getActiveSession()`` returns None — do NOT
    serve, but also do NOT unpersist: an earlier caller in the owning
    session may still hold the handle, and unpersisting a live
    session's localCheckpoint blocks crashes it with a missing-block
    error), or ``"dead"`` (stopped — blocks are gone, evict freely).
    Same hazard family the _SCHEMA_CACHE in sources/tables.py guards
    with ``hit[0] is spark``; here the caller's session isn't a
    parameter, so compare against the active session and treat doubt
    as a miss (rebuild is always correct, just slower)."""
    from pyspark.sql import SparkSession

    try:
        sess = df.sparkSession
        if sess.sparkContext._jsc is None:  # session stopped
            return "dead"
        active = SparkSession.getActiveSession()
        return "ok" if active is sess else "stale"
    except Exception:
        return "dead"


def _memo_session_live(df: DataFrame) -> bool:
    return _memo_session_state(df) == "ok"


def memoized_result_checkpoint(name: str, key: str, build) -> DataFrame:
    """Return the memoized checkpointed result for (name, key), or run
    ``build()`` and checkpoint it. The returned frame's lineage is
    truncated, so it stays valid across release_tracked() epochs until
    the memo itself is evicted (key change, dead session, or
    release_result_memos)."""
    stats = _MEMO_STATS.setdefault(name, {"key": key, "hits": 0, "misses": 0})
    hit = _RESULT_MEMO.get(name)
    if hit is not None and hit[0] == key and _memo_session_live(hit[1]):
        stats["hits"] += 1
        return hit[1]
    if hit is not None:
        # only a DEAD owner's blocks may be unpersisted — a live
        # non-active session's consumers may still hold the handle
        # (its blocks stay resident until that session stops; the
        # overwrite below drops our bookkeeping for them, an accepted
        # bounded leak in the rare concurrent-sessions case)
        if _memo_session_state(hit[1]) == "dead":
            _unpersist_memo_blocks(hit[2])
        del _RESULT_MEMO[name]
    stats["key"] = key
    stats["misses"] += 1
    df = build()
    spark = df.sparkSession
    before = _persistent_rdd_ids(spark)
    out = df.localCheckpoint(eager=True)
    rids = [(spark, rid) for rid in _persistent_rdd_ids(spark) - before]
    _RESULT_MEMO[name] = (key, out, rids)
    return out


def peek_result_memo(name: str, key: str) -> DataFrame | None:
    """Return the memoized checkpointed result for (name, key) if one
    is already warm, WITHOUT building or materializing anything on a
    miss. For consumers whose plain plan is already optimal (no reuse
    of their own) but that can opportunistically ride a calibration
    session's artifact: a hit costs nothing and saves the full build;
    a miss costs nothing at all — in particular no eager localCheckpoint
    materialization, which measures ~25-30% of the build at the
    edge-bound 10x scale for the pair relations. A hit whose session
    has died is evicted and reported as a miss (the caller's plain
    lazy plan is always a correct fallback)."""
    hit = _RESULT_MEMO.get(name)
    if hit is not None and hit[0] == key:
        state = _memo_session_state(hit[1])
        if state == "dead":
            _unpersist_memo_blocks(hit[2])
            del _RESULT_MEMO[name]
            return None
        if state == "stale":
            # alive-but-not-active owner: miss WITHOUT evicting — the
            # owning session's consumers may still use the handle, and
            # it becomes servable again when that session is active
            return None
        stats = _MEMO_STATS.setdefault(name, {"key": key, "hits": 0, "misses": 0})
        stats["hits"] += 1
        return hit[1]
    return None


def _unpersist_memo_blocks(rids, blocking: bool = False) -> None:
    for spark, rid in rids:
        try:
            jrdd = spark.sparkContext._jsc.getPersistentRDDs().get(rid)
            if jrdd is not None:
                jrdd.unpersist(blocking)
        except Exception:
            pass  # session stopped or blocks already evicted


def release_result_memos(blocking: bool = False) -> int:
    """Evict every named result memo (bench cold runs, cache-hygiene
    tests). Bumps the epoch so any guarded handle built on a released
    memo fails fast instead of hitting a missing-block crash."""
    global _EPOCH
    if not _RESULT_MEMO:
        return 0
    _EPOCH += 1
    n = len(_RESULT_MEMO)
    for _key, _df, rids in _RESULT_MEMO.values():
        _unpersist_memo_blocks(rids, blocking)
    _RESULT_MEMO.clear()
    return n


def result_memo_stats(name: str) -> dict | None:
    """Hit/miss counters for one memo name (bench stamps these next to
    the other per-corpus plan decisions)."""
    s = _MEMO_STATS.get(name)
    return dict(s) if s is not None else None
