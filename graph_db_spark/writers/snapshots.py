"""Snapshot-isolated table format for keyed MERGE — the transactional
variant of the staged-rename sink (SCALE.md §6.5).

The reference's whole write story is idempotent Cypher ``MERGE``
(/root/reference/app/graph_fields.py:16-25 and every writer); at 100 TB
that contract needs a table format, not a directory swap. This module is
a minimal Delta/Iceberg-shaped log over plain parquet:

- **Immutable data files, atomic manifest commit.** Every commit writes
  NEW parquet files under ``data/<commit-id>/`` and then publishes one
  manifest ``_manifests/v{N}.json`` with an atomic create-exclusive
  (POSIX ``O_CREAT|O_EXCL`` locally, namenode-atomic
  ``create(overwrite=False)`` on HDFS). The manifest IS the snapshot:
  readers list it and read exactly those files — never a half-written
  directory, never a reader blocked by a writer.
- **Optimistic concurrency, lost-update-free.** Two writers racing to
  version N+1: one manifest create wins; the loser RE-READS the winner's
  snapshot, re-merges its own batch against it, and retries at N+2 —
  both batches' keys survive (the lockfile sink serializes writers; this
  one lets them conflict and repair, which is what Delta/Iceberg do).
- **Bucket-level copy-on-write.** Rows hash into ``n_buckets`` by key;
  a merge rewrites ONLY the buckets its update keys touch, carrying
  every untouched bucket's files forward by reference. Incremental MERGE
  cost is ∝ touched data, not table size — the property that makes a
  100 TB upsert table maintainable. (Real formats add file-level stats
  pruning inside a partition; bucket granularity is the same idea one
  level up, and the bucket column doubles as a co-location key for
  downstream key-joins.)
- **Time travel + exactly-once.** ``read(version=...)`` serves any
  retained snapshot; commits may carry a ``(txn_app, txn_id)`` marker so
  a replayed streaming micro-batch (foreachBatch redelivery) is detected
  and skipped — the Delta ``txnAppId/txnVersion`` pattern.
- **Vacuum.** Data files referenced by no retained manifest are deleted
  explicitly; nothing is ever deleted as a side effect of a commit, so
  readers of retained versions are safe by construction.

Local filesystem paths use plain ``os`` primitives (the test target);
other schemes go through the Hadoop FileSystem API. Object stores
without atomic create need a DynamoDB-style commit arbiter, same as
delta-rs on S3 — documented limitation, not silently wrong.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from graph_db_spark.writers.upsert import collapse_duplicates, upsert

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class CommitConflict(Exception):
    """Another writer published this version first — re-read and retry."""


def _is_local(path: str) -> bool:
    return "://" not in path or path.startswith("file:")


def _local(path: str) -> str:
    return path[len("file:"):] if path.startswith("file:") else path


def _bucket_col(keys: list[str], n_buckets: int):
    # xxhash64 over the key tuple; pmod keeps the result in [0, n_buckets)
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")


class SnapshotTable:
    """A keyed, snapshot-isolated parquet table. See module docstring."""

    def __init__(self, spark: SparkSession, path: str):
        if not _is_local(path):
            raise NotImplementedError(
                "non-local schemes route through the Hadoop FileSystem API; "
                "this build targets local/posix paths (the sandbox has no "
                "cluster filesystem to test against)"
            )
        self.spark = spark
        self.path = _local(path).rstrip("/")

    # -- manifest primitives -------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, _MANIFEST_DIR, f"v{version}.json")

    def latest_version(self) -> int:
        """Highest committed version, or 0 if the table doesn't exist."""
        d = os.path.join(self.path, _MANIFEST_DIR)
        if not os.path.isdir(d):
            return 0
        vs = [
            int(f[1:-5])
            for f in os.listdir(d)
            if f.startswith("v") and f.endswith(".json") and f[1:-5].isdigit()
        ]
        return max(vs, default=0)

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _publish(self, manifest: dict) -> None:
        """The atomic commit point: create-exclusive of v{N}.json.
        EEXIST means another writer won the race to this version."""
        p = self._manifest_path(manifest["version"])
        os.makedirs(os.path.dirname(p), exist_ok=True)
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            raise CommitConflict(f"version {manifest['version']} already committed") from e
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)

    # -- data-file primitives ------------------------------------------

    def _write_buckets(self, df: DataFrame, commit_id: str) -> list[dict]:
        """Write ``df`` (already carrying ``_bucket``) as one immutable
        parquet tree under ``data/<commit_id>/``, hash-distributed so
        each bucket's rows land in its own files. Returns the new file
        entries. Files are never visible to readers until a manifest
        references them, so a crashed commit leaves only garbage for
        vacuum — never a corrupt table."""
        out_dir = os.path.join(self.path, _DATA_DIR, commit_id)
        (
            df.repartition(F.col("_bucket"))
            .write.partitionBy("_bucket")
            .mode("error")
            .parquet(out_dir)
        )
        entries = []
        for bdir in sorted(os.listdir(out_dir)):
            if not bdir.startswith("_bucket="):
                continue
            b = int(bdir.split("=", 1)[1])
            for fn in sorted(os.listdir(os.path.join(out_dir, bdir))):
                if fn.endswith(".parquet"):
                    entries.append(
                        {
                            "bucket": b,
                            "path": f"{_DATA_DIR}/{commit_id}/{bdir}/{fn}",
                        }
                    )
        return entries

    def _read_files(self, manifest: dict, buckets: set[int] | None = None) -> DataFrame:
        """Read a snapshot (optionally only some buckets) by explicit file
        list — file pruning comes from the manifest, not from a directory
        scan, so a reader touches exactly the bytes its buckets own."""
        schema = StructType.fromJson(manifest["schema"])
        entries = manifest["files"]
        if buckets is not None:
            entries = [e for e in entries if e["bucket"] in buckets]
        if not entries:
            empty = self.spark.createDataFrame([], schema)
            return empty.withColumn("_bucket", F.lit(0).cast("int")).limit(0)
        by_bucket: dict[int, list[str]] = {}
        for e in entries:
            by_bucket.setdefault(e["bucket"], []).append(
                os.path.join(self.path, e["path"])
            )
        parts = []
        for b, files in sorted(by_bucket.items()):
            # partitionBy strips _bucket from the file schema; reattach it
            # as a literal per bucket group (cheap, exact)
            parts.append(
                self.spark.read.schema(schema).parquet(*files)
                .withColumn("_bucket", F.lit(b).cast("int"))
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    # -- public surface ------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        keys: list[str],
        n_buckets: int = 16,
    ) -> "SnapshotTable":
        """Create version 1 from ``df`` (duplicate keys collapse
        deterministically, same contract as :func:`upsert`)."""
        t = cls(spark, path)
        if t.latest_version() != 0:
            raise ValueError(f"table already exists at {path}")
        base = collapse_duplicates(df, keys)
        commit_id = uuid.uuid4().hex
        files = t._write_buckets(
            base.withColumn("_bucket", _bucket_col(keys, n_buckets)), commit_id
        )
        t._publish(
            {
                "version": 1,
                "keys": keys,
                "n_buckets": n_buckets,
                "schema": json.loads(base.schema.json()),
                "operation": "create",
                "committed_at": time.time(),
                "txn": None,
                "files": files,
            }
        )
        return t

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read (latest by default; any retained ``version`` for
        time travel). The ``_bucket`` column is internal and dropped."""
        v = version if version is not None else self.latest_version()
        if v == 0:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        return self._read_files(self._read_manifest(v)).drop("_bucket")

    def history(self) -> list[dict]:
        """Commit log, oldest first: version, operation, file/bucket
        counts, txn marker."""
        out = []
        for v in range(1, self.latest_version() + 1):
            m = self._read_manifest(v)
            out.append(
                {
                    "version": m["version"],
                    "operation": m["operation"],
                    "committed_at": m["committed_at"],
                    "n_files": len(m["files"]),
                    "n_buckets_touched": len({e["bucket"] for e in m["files"]}),
                    "txn": m.get("txn"),
                }
            )
        return out

    def merge(
        self,
        updates: DataFrame,
        strategy: str = "overwrite",
        max_retries: int = 5,
        txn: tuple[str, int] | None = None,
    ) -> int:
        """MERGE ``updates`` into the table on its creation keys; returns
        the committed version. Bucket-level copy-on-write: only buckets
        containing an update key are re-merged and rewritten; every other
        bucket's files carry forward by reference.

        ``txn=(app_id, txn_id)``: exactly-once marker. If the latest
        snapshot already carries this app's txn_id ≥ the given one, the
        call is a detected replay and returns without writing (the Delta
        ``txnAppId/txnVersion`` idempotent-sink pattern — a redelivered
        foreachBatch micro-batch commits nothing).

        On a concurrency conflict the merge is recomputed against the
        winning snapshot and retried — neither writer's keys are lost,
        and the retry re-reads only its own touched buckets.
        """
        for _ in range(max_retries):
            v = self.latest_version()
            if v == 0:
                raise FileNotFoundError(f"no snapshots at {self.path}; use create()")
            m = self._read_manifest(v)
            if txn is not None and self._txn_seen(v, txn):
                return v
            keys, n_buckets = m["keys"], m["n_buckets"]
            batch = collapse_duplicates(updates, keys).withColumn(
                "_bucket", _bucket_col(keys, n_buckets)
            )
            batch = batch.localCheckpoint()  # pin the batch across retries
            touched = {
                r["_bucket"] for r in batch.select("_bucket").distinct().collect()
            }
            old_touched = self._read_files(m, touched)
            merged = upsert(
                old_touched.drop("_bucket"), batch.drop("_bucket"), keys, strategy
            ).withColumn("_bucket", _bucket_col(keys, n_buckets))
            commit_id = uuid.uuid4().hex
            new_files = self._write_buckets(merged, commit_id)
            carried = [e for e in m["files"] if e["bucket"] not in touched]
            try:
                self._publish(
                    {
                        "version": v + 1,
                        "keys": keys,
                        "n_buckets": n_buckets,
                        "schema": m["schema"],
                        "operation": f"merge:{strategy}",
                        "committed_at": time.time(),
                        "txn": (
                            {"app": txn[0], "id": txn[1]} if txn is not None else None
                        ),
                        "files": carried + new_files,
                    }
                )
                return v + 1
            except CommitConflict:
                continue  # loser re-reads the winner's snapshot and re-merges
        raise CommitConflict(
            f"merge gave up after {max_retries} conflicts at {self.path}"
        )

    def _txn_seen(self, upto_version: int, txn: tuple[str, int]) -> bool:
        app, tid = txn
        for v in range(upto_version, 0, -1):
            t = self._read_manifest(v).get("txn")
            if t and t["app"] == app:
                return t["id"] >= tid
        return False

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Drop manifests older than the last ``keep_last`` versions and
        delete data files no retained manifest references. Returns the
        deleted file paths. Explicit and separate from commit — a commit
        never deletes anything, so concurrent readers of retained
        snapshots can't lose files mid-scan."""
        latest = self.latest_version()
        cutoff = max(1, latest - keep_last + 1)
        retained: set[str] = set()
        for v in range(cutoff, latest + 1):
            retained.update(e["path"] for e in self._read_manifest(v)["files"])
        removed = []
        data_root = os.path.join(self.path, _DATA_DIR)
        for commit_dir in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
            cdir = os.path.join(data_root, commit_dir)
            for bdir in sorted(os.listdir(cdir)):
                full_bdir = os.path.join(cdir, bdir)
                if not os.path.isdir(full_bdir):
                    continue
                for fn in sorted(os.listdir(full_bdir)):
                    rel = f"{_DATA_DIR}/{commit_dir}/{bdir}/{fn}"
                    if fn.endswith(".parquet") and rel not in retained:
                        os.remove(os.path.join(full_bdir, fn))
                        removed.append(rel)
        for v in range(1, cutoff):
            p = self._manifest_path(v)
            if os.path.exists(p):
                os.remove(p)
        return removed


def snapshot_sink(table: SnapshotTable, app_id: str, strategy: str = "overwrite"):
    """``foreachBatch`` adapter: exactly-once streaming MERGE into a
    snapshot table. The micro-batch id is the txn marker, so Structured
    Streaming's redelivery-after-crash replays commit nothing."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        table.merge(batch_df, strategy=strategy, txn=(app_id, int(batch_id)))

    return write
