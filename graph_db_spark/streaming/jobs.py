"""Structured Streaming analogues of the batch operators — SURVEY.md §2.8.

The reference is batch-only but re-runs overlapping windows incrementally
(``--start/--end``, /root/reference/main_graph_topraq.py:78-80) with
idempotent MERGE writes; these jobs are the honest streaming versions:

| reference behavior                                | here |
|---------------------------------------------------|------|
| daily tumbling aggregation of sensor stats        | ``stream_daily_stats`` (window + watermark) |
| irrigation events = gap-separated intervals       | ``stream_sessions`` (session_window) |
| idempotent MERGE on re-run                        | ``upsert_sink`` (foreachBatch + keyed upsert) |
| late/duplicate rows on overlapping windows        | watermark + ``dedupe_within_watermark`` |

Scale: state size is bounded by the watermark horizon × key cardinality;
output mode "update"/"append" chosen per sink. All transformations are the
same Catalyst plans as the batch versions — one definition, two runners.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_daily_stats(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id", "event_type"),
    value_col: str = "value",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming A1: tumbling 1-day window per key with min/max/avg/sum/count
    — the daily sensor aggregation (graph_weather_day.py:74-117) as an
    incremental job. Late rows beyond the watermark are dropped (the batch
    re-run-with-widened-window pattern, graph_irrigation_event.py:52-53,
    becomes the watermark horizon)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 day").alias("win"), *key_cols)
        .agg(
            F.avg(value_col).alias("data"),
            F.min(value_col).alias("min"),
            F.max(value_col).alias("max"),
            F.avg(value_col).alias("avg"),
            F.sum(value_col).alias("sum"),
            F.count(value_col).alias("n"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day"),
            *key_cols,
            "data", "min", "max", "avg", "sum", "n",
        )
    )


def stream_sessions(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming sessionization: ``session_window`` with the same gap
    semantics as the batch lag+cumsum program (operators/sessionize.py) —
    the GET_IRRIGATIONS interval stream."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), *key_cols)
        .agg(
            F.min(ts_col).alias("start_at"),
            F.max(ts_col).alias("end_at"),
            # exact integer-µs difference over a double divisor — double
            # epoch-seconds arithmetic is 1-ulp engine-dependent and the
            # sf0.1 sweep caught a duration rounding 4.5198 vs the
            # oracle's 4.5199 (same fix as operators/sessionize.py)
            (
                (
                    F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
                    - F.min(F.unix_micros(F.col(ts_col).cast("timestamp")))
                )
                / F.lit(60000000.0)
            ).alias("duration_min"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("win")
    )


def stream_sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    window: str = "6 hours",
    slide: str = "2 hours",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming SLIDING-window aggregation — ``window(ts, w, s)`` with
    s < w, the overlapping-horizon variant the tumbling jobs above can't
    express (a 6h window every 2h: each event lands in w/s = 3 windows).
    State grows w/s× over tumbling for the same key set, bounded as ever
    by watermark horizon × key cardinality; Spark assigns the epoch-
    aligned window starts floor(t/s)·s − k·s inside codegen, so the
    fan-out is an in-task explode, not a join."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("win"), *key_cols)
        .agg(
            F.count(value_col).alias("n"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *key_cols,
            "n",
            "sum_value",
        )
    )


def dedupe_within_watermark(
    events: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "1 day"
) -> DataFrame:
    """Keyed dedupe inside the watermark horizon — the streaming form of the
    idempotent-MERGE contract for replayed rows
    (``dropDuplicatesWithinWatermark``)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming exact dedup — the in-flight form of
    ``operators.dedup.exact_dedup``: documents arriving on a stream are
    keyed by the md5 of their normalized text and only the first copy of
    each content hash passes through. This is the shape a training-data
    ingest pipeline runs BEFORE landing documents, so duplicates never
    reach storage.

    State = one entry per distinct hash. Unbounded here (the fixture is
    finite); a production stream bounds it with an event-time column +
    ``dropDuplicatesWithinWatermark`` on (content_hash) — exactly
    :func:`dedupe_within_watermark` — accepting re-admitted duplicates
    older than the horizon, which the downstream batch
    ``near_dup_clusters`` sweep then catches."""
    from graph_db_spark.operators.text import normalize_text

    return docs.withColumn(
        "content_hash", F.md5(normalize_text(F.col(text_col)))
    ).dropDuplicates(["content_hash"])


def stream_decontaminate(
    docs: DataFrame,
    eval_grams: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ingest-time benchmark decontamination — the streaming half of the
    batch ``benchmark_decontamination`` query: each arriving document is
    flagged if any of its word n-grams appears in the held-out eval set.

    The eval grams ride as ONE static row carrying the whole gram array
    (eval suites are tiny against a 100 TB corpus), joined to the stream
    on a literal key and broadcast into every micro-batch; the overlap
    test is a per-row ``arrays_overlap`` Column expression. Stateless,
    append-mode — no watermark, no state store, a contaminated document
    is flagged the moment it arrives, and a refreshed eval set is picked
    up at the next micro-batch without a restart (same re-resolution
    property as :func:`stream_enriched_daily`)."""
    from graph_db_spark.operators.text import word_ngrams

    one = eval_grams.withColumn("_k", F.lit(1))
    joined = docs.withColumn("_k", F.lit(1)).join(F.broadcast(one), on="_k")
    return joined.select(
        F.col(id_col),
        F.arrays_overlap(
            word_ngrams(F.col(text_col), n), F.col("eval_grams")
        ).alias("contaminated"),
    )


def _fs(spark, p):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(p)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _rename(fs, src, dst) -> None:
    # Hadoop FileSystem.rename signals failure by RETURNING false (and
    # renaming onto an existing directory moves the source INTO it);
    # swallowing that would let the micro-batch commit while the merged
    # table is later deleted as stale — silent data loss. Raise so the
    # batch fails and Spark replays it.
    if not fs.rename(src, dst):
        raise IOError(f"rename failed: {src} -> {dst}")


def _is_local_path(p: str) -> bool:
    from urllib.parse import urlparse

    return urlparse(p).scheme in ("", "file")


def _local_part(p: str) -> str:
    from urllib.parse import urlparse

    u = urlparse(p)
    return u.path if u.scheme else p


# one in-process mutex per table path: serializes concurrent sinks inside
# the same driver without busy-waiting on the filesystem lock
_PROCESS_LOCKS: dict[str, "threading.Lock"] = {}
_PROCESS_LOCKS_GUARD = None


def _process_lock(path: str):
    import threading

    global _PROCESS_LOCKS_GUARD
    if _PROCESS_LOCKS_GUARD is None:
        _PROCESS_LOCKS_GUARD = threading.Lock()
    with _PROCESS_LOCKS_GUARD:
        return _PROCESS_LOCKS.setdefault(path, threading.Lock())


class TableLock:
    """Single-writer lock for a staged-rename parquet table.

    The staged-rename merge is read-modify-write: two concurrent writers
    that both read the current table each merge only their OWN batch, and
    the last swap wins — silently dropping the other writer's keys. Plain
    parquet has no transaction log, so concurrent MERGE needs mutual
    exclusion. Two layers:

    - **in-process**: a per-path ``threading.Lock`` — two streaming sinks
      (or a sink + a batch writer) in the same driver serialize without
      touching the filesystem;
    - **cross-process**: an exclusive lockfile. For local paths the
      create uses POSIX ``O_CREAT|O_EXCL`` (truly atomic — Hadoop's
      RawLocalFileSystem ``createNewFile`` is a non-atomic exists+create
      and measurably races under thread interleaving); for cluster
      filesystems it uses Hadoop ``createNewFile``, which HDFS makes
      atomic at the namenode. On eventual-consistency object stores
      neither is a real lock — there, and in production generally, the
      answer is a transactional table format whose optimistic commit IS
      the concurrency story (SCALE.md §6.5); this is the sound
      plain-parquet fallback.

    Crash-robustness: a writer that dies holding the lock would block all
    successors, so locks older than ``ttl_ms`` are broken (the staged
    swap they guarded is itself crash-recoverable). A LIVE holder is
    protected from TTL breaking by a heartbeat: a daemon thread bumps the
    lockfile mtime every ``ttl_ms/3``, so only a dead writer's lock ever
    looks stale — a merge slower than the TTL no longer loses the lock
    mid-flight (review finding). Each lockfile carries its holder's
    random token, and release/breaking deletes the file only if the token
    still matches what the deleter expects — a holder that somehow lost
    the lock can't cascade-delete the NEXT holder's lock. Breaking
    re-checks freshness immediately before deleting; the residual
    two-breaker race is inherent to lockfiles without compare-and-swap.
    """

    def __init__(self, spark, path: str, ttl_ms: int = 600_000, timeout_ms: int = 120_000, poll_ms: int = 50):
        import uuid

        self.spark, self.table_path, self.path = spark, path, path + "__lock"
        self.ttl_ms, self.timeout_ms, self.poll_ms = ttl_ms, timeout_ms, poll_ms
        self._plock = _process_lock(path)
        self._token = uuid.uuid4().hex
        self._hb_stop = None

    # -- lockfile primitives, local-atomic or hadoop ---------------------
    def _try_create(self) -> bool:
        if _is_local_path(self.path):
            import os

            try:
                local = _local_part(self.path)
                os.makedirs(os.path.dirname(local) or ".", exist_ok=True)
                fd = os.open(local, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, self._token.encode())
                os.close(fd)
                return True
            except FileExistsError:
                return False
        fs, lock = _fs(self.spark, self.path)
        try:
            # create(overwrite=False) is the namenode-atomic primitive;
            # the token rides in the file body
            out = fs.create(lock, False)
            out.write(bytearray(self._token.encode()))
            out.close()
            return True
        except Exception:
            return False

    def _read_token(self) -> str | None:
        try:
            if _is_local_path(self.path):
                with open(_local_part(self.path)) as f:
                    return f.read()
            fs, lock = _fs(self.spark, self.path)
            stream = fs.open(lock)
            token = self.spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
            stream.close()
            return token
        except Exception:
            return None

    def _touch(self) -> None:
        import contextlib
        import time

        with contextlib.suppress(Exception):
            if _is_local_path(self.path):
                import os

                os.utime(_local_part(self.path), None)
            else:
                fs, lock = _fs(self.spark, self.path)
                now = int(time.time() * 1000)
                fs.setTimes(lock, now, now)

    def _start_heartbeat(self) -> None:
        import threading

        stop = threading.Event()
        interval = max(self.ttl_ms / 3000.0, 0.05)

        def beat() -> None:
            while not stop.wait(interval):
                self._touch()

        t = threading.Thread(target=beat, daemon=True, name=f"tablelock-hb-{self.table_path}")
        t.start()
        self._hb_stop = stop

    def _age_ms(self) -> float | None:
        import time

        try:
            if _is_local_path(self.path):
                import os

                return time.time() * 1000 - os.stat(_local_part(self.path)).st_mtime * 1000
            fs, lock = _fs(self.spark, self.path)
            return time.time() * 1000 - fs.getFileStatus(lock).getModificationTime()
        except Exception:
            return None  # vanished between probe and stat

    def _delete(self, expect_token: str | None) -> None:
        """Delete the lockfile, but only when its token matches
        ``expect_token`` (None = delete unconditionally — used when the
        breaker just read the token it is breaking)."""
        if expect_token is not None and self._read_token() != expect_token:
            return
        if _is_local_path(self.path):
            import contextlib
            import os

            with contextlib.suppress(OSError):
                os.unlink(_local_part(self.path))
            return
        fs, lock = _fs(self.spark, self.path)
        fs.delete(lock, False)

    def __enter__(self):
        import time

        if not self._plock.acquire(timeout=self.timeout_ms / 1000.0):
            raise TimeoutError(f"could not acquire in-process table lock {self.path}")
        try:
            deadline = time.time() + self.timeout_ms / 1000.0
            while True:
                if self._try_create():
                    self._start_heartbeat()
                    return self
                age = self._age_ms()
                if age is not None and age > self.ttl_ms:
                    stale_token = self._read_token()
                    # re-probe right before breaking: only delete if STILL
                    # stale AND still the same holder we judged stale
                    age2 = self._age_ms()
                    if age2 is not None and age2 > self.ttl_ms:
                        self._delete(expect_token=stale_token)
                    continue
                if time.time() > deadline:
                    raise TimeoutError(f"could not acquire table lock {self.path}")
                time.sleep(self.poll_ms / 1000.0)
        except BaseException:
            self._plock.release()
            raise

    def __exit__(self, *exc):
        try:
            if self._hb_stop is not None:
                self._hb_stop.set()
                self._hb_stop = None
            # release only OUR lock: if a breaker took it over, the token
            # differs and the new holder's lockfile survives
            self._delete(expect_token=self._token)
        finally:
            self._plock.release()
        return False


def merge_into_parquet_table(
    batch_df: DataFrame, path: str, keys: list[str], co_partition: bool = False
) -> None:
    """One serialized MERGE of ``batch_df`` into the parquet table at
    ``path``: acquire the single-writer lock, read-merge-stage-swap,
    release. Module-level so the streaming sink, the pipeline CLI, and
    the concurrency test share the exact code path. ``co_partition``
    repartitions the merged table by ``keys`` before landing (the
    bucketing analogue for plain parquet — downstream key joins read
    co-located data). The staged ``__next`` write also means the merge
    never overwrites the parquet directory it is lazily reading from."""
    from graph_db_spark.writers.upsert import upsert

    spark = batch_df.sparkSession
    with TableLock(spark, path):
        jvm = spark._jvm
        fs, cur = _fs(spark, path)
        nxt = jvm.org.apache.hadoop.fs.Path(path + "__next")
        old = jvm.org.apache.hadoop.fs.Path(path + "__old")
        # recover from a crash between the two renames of a prior batch:
        # current missing but __old present → the old table is still intact.
        if not fs.exists(cur) and fs.exists(old):
            _rename(fs, old, cur)
        # drop stale leftovers from interrupted batches ('_next' is the
        # pre-round-2 staging suffix — one-time migration cleanup)
        legacy = jvm.org.apache.hadoop.fs.Path(path + "_next")
        for stale in (nxt, old, legacy):
            if fs.exists(stale):
                fs.delete(stale, True)
        # explicit existence probe instead of parsing exception messages —
        # only a genuinely missing path is a first write; any other read
        # error (corruption, permissions) raises out of spark.read below.
        existing = spark.read.parquet(path) if fs.exists(cur) else None
        merged = upsert(existing, batch_df, keys)
        if co_partition:
            merged = merged.repartition(*keys)
        merged.write.mode("overwrite").parquet(path + "__next")
        # swap: cur→old, next→cur, drop old. Each rename is atomic and
        # failure-checked; every intermediate state is recoverable (see
        # recovery block above).
        if fs.exists(cur):
            _rename(fs, cur, old)
        _rename(fs, nxt, cur)
        if fs.exists(old):
            fs.delete(old, True)


def upsert_sink(query_df: DataFrame, path: str, keys: list[str], checkpoint: str):
    """foreachBatch sink running the keyed upsert per micro-batch — MERGE
    semantics onto a parquet table (on Delta/Iceberg this becomes MERGE
    INTO directly). Returns the started StreamingQuery.

    Crash-safety: the merged table is staged at ``path__next`` and swapped
    in via filesystem renames (atomic on HDFS/local; Delta/Iceberg replace
    this with a transactional commit). The current table is never deleted
    before its replacement exists — a crash at any point leaves either the
    old table at ``path`` or a recoverable ``path__old``, so replayed
    micro-batches never mistake a partial write for a first write.

    Concurrency: batches serialize through :class:`TableLock`, so two
    sinks (or a sink plus a batch writer) interleaving on the same table
    cannot lose each other's keys — unit-tested by interleaving writers
    in ``tests/test_upsert.py``.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_into_parquet_table(batch_df, path, keys)

    return (
        query_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )


def stateful_sessions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState`` — the
    escape hatch for operators ``session_window`` can't express (per-key
    custom state machines; SURVEY §2.8 "flatMapGroupsWithState-equivalent").

    Same gap semantics as the batch ``session_intervals`` (a strictly
    greater-than-``gap`` silence starts a new session,
    operators/sessionize.py): state per key = (start, last, n) of the open
    session; each closed session is emitted as
    ``(key, start_at, end_at, duration_min, n_events)``. The open tail
    session stays in state until a later event (or a sentinel) closes it.

    Scale: state is three longs per key — bounded by key cardinality, not
    history; Arrow-batched per micro-batch, no per-row Python crossings.
    """
    import pandas as pd  # noqa: F401 — required by the worker closure
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0
        ts_all = pd.concat([pdf[ts_col] for pdf in pdfs]).sort_values()
        closed: list[tuple] = []
        for t in ts_all:
            tus = pd.Timestamp(t).value // 1000  # ns → µs
            if last_us is None:
                start_us, last_us, n = tus, tus, 1
            elif tus - last_us > gap_us:
                closed.append((key[0], start_us, last_us, n))
                start_us, last_us, n = tus, tus, 1
            else:
                last_us, n = tus, n + 1
        if last_us is not None:
            state.update((int(start_us), int(last_us), int(n)))
        if closed:
            yield pd.DataFrame(
                closed, columns=[key_col, "start_us", "end_us", "n_events"]
            )

    raw = events.select(key_col, ts_col).groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} bigint, start_us bigint, end_us bigint, n_events bigint",
        stateStructType="start_us bigint, last_us bigint, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return raw.select(
        key_col,
        F.timestamp_micros(F.col("start_us")).alias("start_at"),
        F.timestamp_micros(F.col("end_us")).alias("end_at"),
        ((F.col("end_us") - F.col("start_us")) / F.lit(60_000_000.0)).alias("duration_min"),
        "n_events",
    )


def stream_enriched_daily(
    events: DataFrame,
    dim: DataFrame,
    dim_key: str,
    seg_col: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "1 day",
) -> DataFrame:
    """§2.8 stream-static enrichment: the per-event enrichment the reference
    performs after an event closes (vwc before/after,
    graph_irrigation_event.py:260-291) as a streaming join — each
    micro-batch inner-joins the static dimension (re-resolved per batch,
    so a refreshed dim table is picked up without restarting), then
    windows into daily per-segment totals. Stream-static inner joins
    need no watermark on the static side; the window agg carries the
    stream's own watermark for state eviction.

    No forced broadcast on the dim (r13 dim_hint audit): streaming plans
    get no AQE, so the planner picks broadcast from the static side's
    file statistics (autoBroadcastJoinThreshold) — a customer-sized dim
    auto-broadcasts at bench scale and degrades to a per-batch
    shuffle-hash join once it outgrows the threshold, instead of a
    forced hint aborting the stream at cluster scale."""
    enriched = events.join(
        dim.select(F.col(dim_key).alias(user_col), F.col(seg_col)),
        on=user_col,
    )
    return (
        enriched.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 day").alias("win"), seg_col)
        .agg(F.sum(value_col).alias("total"), F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day"),
            F.col(seg_col),
            "total",
            "n",
        )
    )


def stream_incremental_dedup(
    stream_docs: DataFrame,
    index_banded: DataFrame,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Ingest-time APPROXIMATE dedup: each micro-batch of new documents
    is LSH-checked against the persisted banded index of the existing
    corpus (operators/dedup.py:minhash_banded) and the candidate pairs
    land in ``out_path``. The corpus is never re-signed and never
    self-joins — per batch the work is O(batch·bands) plus the touched
    index rows, which is what keeps continuous crawl ingest linear.
    Complements :func:`stream_exact_dedup` (the exact-hash half); the
    batch sweep (`minhash_lsh_candidates`) remains the at-rest half.
    ``foreachBatch`` is the right tool here: candidate generation is a
    multi-stage batch program (signature agg + banded join), not a
    single streaming-expressible aggregation. Returns the started
    StreamingQuery."""
    from graph_db_spark.operators.dedup import minhash_lsh_candidates_against

    def batch(bdf: DataFrame, batch_id: int) -> None:
        cands = minhash_lsh_candidates_against(bdf, index_banded, text_col, id_col)
        # per-batch OVERWRITE subdir, not a blind append: a micro-batch
        # replayed after a crash-between-commit-and-checkpoint rewrites
        # its own partition instead of duplicating pairs (the same
        # idempotence discipline as upsert_sink's staged swap); readers
        # see hive-style batch_id partitions under out_path
        cands.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    return (
        stream_docs.writeStream.foreachBatch(batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_touch_pairs(
    purchases: DataFrame,
    touches: DataFrame,
    window_hours: int = 24,
    p_watermark: str = "1 day",
    t_watermark: str = "2 days",
    how: str = "inner",
) -> DataFrame:
    """STREAM-STREAM inner join: each purchase pairs with every
    view/click by the same user in the preceding ``window_hours`` — the
    ingest-time half of touch attribution (the batch `asof_join` picks
    the LAST touch; per-group ranking isn't append-expressible, so the
    stream emits the pair set and the last-touch pick stays batch/
    foreachBatch).

    This is the one stateful shape the other §2.8 jobs don't cover:
    BOTH sides buffer in the state store, and the watermarks + the
    time-interval join condition bound that state — a touch can only
    match purchases up to ``window_hours`` ahead, so rows age out of
    state once the other side's watermark passes their match horizon.
    Without the interval condition the state would grow unboundedly;
    with it, state ≈ each side's watermark horizon of rows.

    ``how='left_outer'`` adds the null-emission contract: a purchase
    with NO touch in its window emits once with null touch columns —
    but only after the query's GLOBAL watermark (the min of both sides'
    watermarks) passes its ``pts``, because until then a matching touch
    could still arrive; purchases younger than that horizon at
    end-of-stream stay buffered and never emit. That timing is exactly
    what the ``streaming_left_outer_attribution`` oracle encodes.
    """
    p = purchases.select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"), F.col("value").alias("pvalue"),
    ).withWatermark("pts", p_watermark)
    t = touches.select(
        F.col("user_id").alias("t_user"), F.col("ts").alias("tts"),
        F.col("event_type").alias("touch"),
    ).withWatermark("tts", t_watermark)
    return p.join(
        t,
        F.expr(
            f"p_user = t_user AND tts <= pts AND tts >= pts - INTERVAL {window_hours} HOURS"
        ),
        how,
    )
