"""Minimal Delta Lake transaction log — writer + reader for the subset
of the OPEN Delta protocol the reference's table contract relies on.

The reference persists batch tables with ``saveAsTable`` and streams
into Delta with ``writeStream.format("delta")`` + checkpoint
(BATCH:108-109, STREAM:174-192). delta-spark cannot be installed in
this environment, but the TRANSACTION LOG FORMAT is a public
specification (delta.io PROTOCOL.md): a table is a directory of parquet
data files plus ``_delta_log/%020d.json`` commit files, each holding
newline-delimited action objects (``protocol`` / ``metaData`` / ``add``
/ ``remove`` / ``txn`` / ``commitInfo``). This module implements that
contract directly so the behaviors Delta exists for are actually
EXERCISED here, not just documented:

- **Atomic commits with optimistic concurrency**: a commit is staged to
  a temp file and published with ``os.link`` to the next version number
  — link fails if the version exists, so two concurrent writers cannot
  both claim a version; the loser re-reads the log and retries.
- **Append vs overwrite**: overwrite commits ``remove`` actions for the
  previously-active file set; readers of older versions still see them
  (files are never deleted — that is VACUUM's job, out of scope).
- **Time travel**: the reader replays actions up to a requested
  version; the active file set at that version IS the snapshot.
- **Idempotent streaming appends**: the ``txn`` action records
  (appId, version); a foreachBatch sink passing its batch_id gets
  exactly-once appends under Structured Streaming's at-least-once
  replay — the mechanism behind Delta's streaming exactly-once.

This is NOT a full Delta implementation (no checkpoints.parquet, no
column stats, no deletion vectors, protocol pinned to reader=1/
writer=2); ``sources/io.py``'s ``delta_available`` gate still routes to
real delta-spark when present. The point is that the table CONTRACT the
reference depends on — atomic visibility, historical reads, replay
safety — runs and is tested in this repo.

Scale note: the ``os.link`` publish is atomic on POSIX filesystems and
HDFS-mounted paths; object stores without atomic rename-if-absent (S3)
need a coordinating LogStore exactly as real Delta does — the commit
protocol here is the single-writer-per-version contract, and only the
publish primitive is storage-specific. Log replay cost grows linearly
with version count because checkpoint parquet files are not
implemented; for the reference's table lifecycles (one batch overwrite
+ one streaming appender) that is tens of versions, not thousands.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_PROTOCOL = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _log_dir(path: str | Path) -> Path:
    return Path(path) / "_delta_log"


def _versions(path: str | Path) -> list[int]:
    log = _log_dir(path)
    if not log.is_dir():
        return []
    return sorted(
        int(p.stem) for p in log.glob("*.json") if p.stem.isdigit()
    )


def _replay(path: str | Path, version: int | None = None) -> dict:
    """Replay the log up to ``version`` (inclusive; None = latest).
    Returns {files: {path: add}, metadata, txns: {appId: version},
    version: replayed-through}."""
    versions = _versions(path)
    if version is not None:
        versions = [v for v in versions if v <= version]
        if not versions or versions[-1] != version:
            raise ValueError(f"version {version} not in log for {path}")
    files: dict[str, dict] = {}
    metadata: dict | None = None
    txns: dict[str, int] = {}
    for v in versions:
        with open(_log_dir(path) / f"{v:020d}.json") as f:
            for line in f:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    files[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    files.pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    metadata = action["metaData"]
                elif "txn" in action:
                    t = action["txn"]
                    txns[t["appId"]] = max(t["version"], txns.get(t["appId"], -1))
    return {
        "files": files,
        "metadata": metadata,
        "txns": txns,
        "version": versions[-1] if versions else -1,
    }


def _stage_data_files(df: DataFrame, path: Path) -> list[dict]:
    """Write the DataFrame's parquet part files into the table root
    under unique names; return their ``add`` actions."""
    tmp = path / f"_staging_{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(str(tmp))
    adds = []
    for part in sorted(tmp.glob("*.parquet")):
        name = f"part-{uuid.uuid4().hex}.snappy.parquet"
        os.replace(part, path / name)
        adds.append(
            {
                "add": {
                    "path": name,
                    "partitionValues": {},
                    "size": (path / name).stat().st_size,
                    "modificationTime": int((path / name).stat().st_mtime * 1000),
                    "dataChange": True,
                }
            }
        )
    for leftover in tmp.glob("*"):
        leftover.unlink()
    tmp.rmdir()
    return adds


def write_delta(
    df: DataFrame,
    path: str | Path,
    mode: str = "append",
    txn_app: str | None = None,
    txn_version: int | None = None,
    max_retries: int = 10,
) -> bool:
    """Commit ``df`` to the delta-lite table at ``path``.

    Returns True if a commit was published, False if an idempotent
    ``txn`` guard suppressed it (the caller's (txn_app, txn_version)
    was already committed — the foreachBatch replay case)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    root = Path(path)
    root.mkdir(parents=True, exist_ok=True)
    _log_dir(root).mkdir(exist_ok=True)

    state = _replay(root)
    if (
        txn_app is not None
        and txn_version is not None
        and state["txns"].get(txn_app, -1) >= txn_version
    ):
        return False

    adds = _stage_data_files(df, root)
    for _ in range(max_retries):
        actions: list[dict] = []
        next_version = state["version"] + 1
        if next_version == 0:
            actions.append(_PROTOCOL)
        if next_version == 0 or state["metadata"] is None:
            actions.append(
                {
                    "metaData": {
                        "id": str(uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": df.schema.json(),
                        "partitionColumns": [],
                        "configuration": {},
                    }
                }
            )
        if mode == "overwrite":
            actions.extend(
                {"remove": {"path": p, "dataChange": True}}
                for p in state["files"]
            )
        actions.extend(adds)
        if txn_app is not None and txn_version is not None:
            actions.append({"txn": {"appId": txn_app, "version": txn_version}})
        actions.append(
            {"commitInfo": {"operation": mode.upper(), "numFiles": len(adds)}}
        )

        staged = _log_dir(root) / f".tmp-{uuid.uuid4().hex}.json"
        staged.write_text("\n".join(json.dumps(a) for a in actions) + "\n")
        target = _log_dir(root) / f"{next_version:020d}.json"
        try:
            os.link(staged, target)  # atomic publish; fails if version taken
            staged.unlink()
            return True
        except FileExistsError:  # lost the race: refresh state, retry
            staged.unlink()
            state = _replay(root)
            if (
                txn_app is not None
                and txn_version is not None
                and state["txns"].get(txn_app, -1) >= txn_version
            ):
                # the winner was our own replayed batch — drop our files
                for a in adds:
                    (root / a["add"]["path"]).unlink(missing_ok=True)
                return False
    raise RuntimeError(f"could not commit to {path} after {max_retries} retries")


def read_delta(
    spark: SparkSession, path: str | Path, version: int | None = None
) -> DataFrame:
    """Snapshot read (optionally time-traveled to ``version``): replay
    the log, read exactly the active parquet files. An empty snapshot
    still carries the table schema from metaData."""
    state = _replay(path, version)
    root = Path(path)
    files = [str(root / p) for p in state["files"]]
    if not files:
        if state["metadata"] is None:
            raise ValueError(f"no delta-lite table at {path}")
        schema = StructType.fromJson(json.loads(state["metadata"]["schemaString"]))
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*files)


def table_version(path: str | Path) -> int:
    """Latest committed version (-1 if the table does not exist)."""
    return _replay(path)["version"]


def merge_delta(
    df: DataFrame,
    path: str | Path,
    key: str,
    txn_app: str | None = None,
    txn_version: int | None = None,
) -> bool:
    """Keyed upsert (the MERGE INTO shape) as one atomic delta-lite
    commit: the new snapshot is existing-rows-not-matching-``key``
    unioned with ``df``, published as an overwrite — readers see the
    pre-merge or post-merge table, never a mix, and time travel still
    reaches the pre-merge version. This is what the parquet foreachBatch
    upsert sink (streaming/jobs.py::write_foreach_batch_upsert) becomes
    once the table carries a log; real Delta does the same with
    file-level pruning instead of a full rewrite."""
    existing = None
    try:
        existing = read_delta(df.sparkSession, path)
    except ValueError:  # table does not exist yet
        pass
    if existing is not None:
        dedup = df.dropDuplicates([key])
        merged = existing.join(dedup, key, "left_anti").unionByName(
            dedup, allowMissingColumns=False
        )
        # materialize before the commit stages files (the plan reads the
        # same parquet files the overwrite will supersede)
        merged = merged.localCheckpoint(eager=True)
    else:
        merged = df.dropDuplicates([key])
    return write_delta(
        merged, path, mode="overwrite", txn_app=txn_app, txn_version=txn_version
    )


def vacuum_delta(path: str | Path, keep_versions: int = 1) -> int:
    """Delete data files no longer referenced by the last
    ``keep_versions`` snapshots (the VACUUM maintenance op — real Delta
    gates on retention TIME; version count is the test-friendly
    equivalent). Time travel to vacuumed-away versions stops working,
    exactly as with real VACUUM. Returns the number of files deleted.

    Safe ordering: the active set is computed from the log BEFORE any
    unlink, and only files absent from every retained snapshot are
    touched — a concurrent reader of a retained version never loses a
    file under it."""
    root = Path(path)
    versions = _versions(root)
    if not versions:
        return 0
    retained = versions[-keep_versions:]
    keep: set[str] = set()
    for v in retained:
        keep.update(_replay(root, v)["files"])
    deleted = 0
    for f in root.glob("*.parquet"):
        if f.name not in keep:
            f.unlink()
            deleted += 1
    return deleted


def write_stream_delta_append(
    df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Streaming append into a delta-lite table: foreachBatch commits
    each micro-batch with a (stream appId, batch_id) ``txn`` action, so
    a batch replayed after a crash between data write and checkpoint
    commit is suppressed by the log itself — the exactly-once sink
    contract of STREAM:174-192, reproduced on the open log format."""
    app = f"stream-{checkpoint}"

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        write_delta(batch, path, mode="append", txn_app=app, txn_version=batch_id)

    writer = (
        df.writeStream.foreachBatch(commit_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
