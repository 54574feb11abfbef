"""delta_lite — a minimal pure-Python implementation of the open Delta
Lake transaction-log protocol (delta.io PROTOCOL.md), over Spark parquet.

The environment has no ``delta-spark`` connector jar (the §2.2
"Delta/Iceberg write+read" row has been honestly feature-gated since
round 1: ``sources.tables.write_table``). The LOG format itself, however,
is an open JSON specification — so the write+read semantics the row asks
for can be implemented from the public spec without the connector:

- a TABLE is a directory of parquet data files plus ``_delta_log/``
  containing one JSON file per committed version
  (``00000000000000000000.json``, …);
- each log file is newline-delimited actions: ``protocol`` and
  ``metaData`` (first commit), ``add`` (file became part of the table),
  ``remove`` (file logically deleted), ``commitInfo`` (audit);
- the table state at version V = replay of log files 0..V: active files
  = adds minus later removes. Readers read exactly those parquet files.
- commits are ATOMIC via write-temp + ``os.link`` into the log
  directory (EEXIST = a concurrent writer won the version = the
  optimistic-concurrency conflict the protocol defines; single-writer
  here: we raise, never retry-merge).

Honest scope (documented, enforced by errors — not silently wrong):

- Single-part classic checkpoints only (``V.checkpoint.parquet`` +
  ``_last_checkpoint``): :func:`checkpoint_delta` compacts the replay
  state into one parquet file (the spec's log-compaction — at real
  commit rates, replaying every JSON commit grows linearly and the
  checkpoint bounds it), and the reader resumes from the newest
  checkpoint at or below the requested version. Multi-part or v2
  checkpoints (sidecars) are refused, as is a ``_last_checkpoint``
  whose parquet is missing.
- minReaderVersion=1 / minWriterVersion=2 tables only — no deletion
  vectors, column mapping, or generated columns; reading a table that
  declares a higher reader version raises.
- Single-writer optimistic concurrency (version-file rename): a lost
  race raises ``ConcurrentWriteError``.
- Partition columns use the hive layout (``col=value/``) so Spark's own
  parquet reader reconstructs them via ``basePath`` — the Delta spec
  stores ``partitionValues`` in the log (we do too, and the reader
  CHECKS them against the path) but delegating column materialization to
  the hive layout keeps the read path one ``spark.read.parquet`` call.

Everything here derives from the public protocol document and the Spark
API; the resulting tables are spec-shaped (JSON log + parquet data), and
the unit tests replay write→read→time-travel→overwrite against plain
parquet ground truth.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first (optimistic-concurrency
    conflict; this minimal single-writer implementation never retries)."""


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def _version_file(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:020d}.json")


def _existing_versions(path: str) -> list[int]:
    ld = _log_dir(path)
    if not os.path.isdir(ld):
        return []
    out = []
    for fn in os.listdir(ld):
        if fn.endswith(".json") and len(fn) == 25:
            try:
                out.append(int(fn[:-5]))
            except ValueError:
                continue
    return sorted(out)


def _checkpoint_file(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:020d}.checkpoint.parquet")


def _last_checkpoint_version(path: str) -> int | None:
    """Version of the newest checkpoint per ``_last_checkpoint``, verified
    single-part classic; None if the table has no checkpoint."""
    lc = os.path.join(_log_dir(path), "_last_checkpoint")
    if not os.path.exists(lc):
        return None
    with open(lc, encoding="utf-8") as f:
        meta = json.loads(f.read().strip() or "{}")
    if meta.get("parts") not in (None, 1):
        raise NotImplementedError(
            "multi-part checkpoints are not supported by delta_lite"
        )
    v = meta.get("version")
    if v is None or not os.path.exists(_checkpoint_file(path, v)):
        raise NotImplementedError(
            "_last_checkpoint present but its single-part classic "
            "checkpoint parquet is missing/unsupported — only a full Delta "
            "reader can resume this table"
        )
    return int(v)


def _read_checkpoint(path: str, version: int) -> dict:
    """State snapshot from a classic checkpoint parquet (driver-side
    pyarrow read — the log is metadata-scale by design)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(_checkpoint_file(path, version)).to_pylist()
    files: dict[str, dict] = {}
    metadata: dict | None = None
    for row in tbl:
        proto = row.get("protocol")
        if proto:
            mrv = proto.get("minReaderVersion", 1)
            if mrv and mrv > 1:
                raise NotImplementedError(
                    f"checkpoint requires minReaderVersion {mrv}; "
                    "delta_lite reads version-1 tables only"
                )
        md = row.get("metaData")
        if md and md.get("id"):
            metadata = dict(md)
            if isinstance(metadata.get("partitionColumns"), tuple):
                metadata["partitionColumns"] = list(
                    metadata["partitionColumns"]
                )
        add = row.get("add")
        if add and add.get("path"):
            add = dict(add)
            add["partitionValues"] = dict(add.get("partitionValues") or {})
            files[add["path"]] = add
    return {"files": files, "metadata": metadata}


def _replay(path: str, version: int | None = None) -> dict:
    """Replay the log up to ``version`` (inclusive; latest if None),
    resuming from the newest checkpoint at or below it when one exists
    (the spec's read path: checkpoint state + later JSON commits).
    Returns {"files": {relpath: add_action}, "metadata": …,
    "version": int}."""
    versions = _existing_versions(path)
    cp_version = _last_checkpoint_version(path)
    if not versions and cp_version is None:
        raise FileNotFoundError(f"not a delta_lite table (no log): {path}")
    cp_v = -1 if cp_version is None else cp_version
    latest = max(versions[-1] if versions else -1, cp_v)
    if version is None:
        version = latest
    if version > latest or version < 0:
        raise ValueError(f"version {version} not in log (latest {latest})")

    files: dict[str, dict] = {}
    metadata: dict | None = None
    start_after = -1
    if cp_version is not None and cp_version <= version:
        state = _read_checkpoint(path, cp_version)
        files = state["files"]
        metadata = state["metadata"]
        start_after = cp_version
    # every JSON commit in (start_after, version] must be present — a
    # cleaned-up log can no longer serve pre-checkpoint time travel
    need = set(range(start_after + 1, version + 1))
    have = set(versions)
    if not need <= have:
        missing = sorted(need - have)
        raise ValueError(
            f"version {version} not reconstructable: log files "
            f"{missing} are absent (cleaned up after checkpointing?)"
        )
    for v in versions:
        if v <= start_after:
            continue
        if v > version:
            break
        with open(_version_file(path, v), encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    mrv = action["protocol"].get("minReaderVersion", 1)
                    if mrv > 1:
                        raise NotImplementedError(
                            f"table requires minReaderVersion {mrv}; "
                            "delta_lite reads version-1 tables only"
                        )
                elif "metaData" in action:
                    metadata = action["metaData"]
                elif "add" in action:
                    files[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    files.pop(action["remove"]["path"], None)
    return {"files": files, "metadata": metadata, "version": version}


def _commit(path: str, version: int, actions: list[dict]) -> None:
    """Atomic single-file commit: write the full content to a temp name,
    then ``os.link`` it to the version name — link(2) fails with EEXIST
    if the destination exists and the destination appears fully written
    or not at all (no empty-file window, unlike create-then-replace; no
    silent clobber, unlike rename). A lost race between two writers
    surfaces as ConcurrentWriteError — the protocol's optimistic-
    concurrency conflict."""
    ld = _log_dir(path)
    os.makedirs(ld, exist_ok=True)
    dest = _version_file(path, version)
    tmp = os.path.join(ld, f".{uuid.uuid4().hex}.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        for a in actions:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, dest)
    except FileExistsError as exc:
        raise ConcurrentWriteError(
            f"version {version} was committed concurrently at {path}"
        ) from exc
    finally:
        os.unlink(tmp)


def _rel_data_files(path: str) -> list[str]:
    """Relative paths of every parquet data file currently on disk (hive
    layout aware), EXCLUDING the log directory."""
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if d != "_delta_log"]
        for fn in files:
            if fn.endswith(".parquet"):
                out.append(
                    os.path.relpath(os.path.join(root, fn), path)
                )
    return sorted(out)


def _partition_values(relpath: str, partition_by: tuple[str, ...]) -> dict:
    """partitionValues per the spec, parsed from the hive path segments."""
    vals: dict[str, str] = {}
    for seg in relpath.split(os.sep)[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            if k in partition_by:
                vals[k] = v
    return vals


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] | None = None,
) -> int:
    """Write ``df`` as a delta_lite table commit; returns the committed
    version. ``mode``: "overwrite" (logical remove of all prior files +
    adds) or "append" (adds only). Data files are written by Spark's
    parquet sink into a per-commit subdirectory (so concurrent data-file
    names never collide and old versions' files stay readable for time
    travel — spec-legal: add paths are arbitrary relative paths).

    ``partition_by`` on an EXISTING table is inherited from the table's
    metaData when omitted and validated against it when given — the Delta
    contract pins partition columns at table creation, and silently
    writing a commit in a different layout would leave the table with
    files the partition-column reconstruction cannot read.

    Layout matches the real connector: data files live in hive
    partition directories AT THE TABLE ROOT (``col=val/part-*.parquet``;
    Spark's UUID file names prevent cross-commit collisions), because
    per-commit SUBdirectories make Spark's partition discovery see
    conflicting structures across commits under one basePath. The new
    files of a commit are identified by a before/after listing diff —
    sound under the declared single-writer model.

    Scale shape: the data write IS ``df.write.parquet`` — fully
    distributed, partitioned via the hive layout; only the log commit
    (a few hundred bytes per file action) is driver-side, exactly like
    the real connector's driver-side transaction commit."""
    versions = _existing_versions(path)
    cp_version = _last_checkpoint_version(path)
    cp_v = -1 if cp_version is None else cp_version
    latest = max(versions[-1] if versions else -1, cp_v)
    version = latest + 1
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported mode {mode!r}")
    prior_state = _replay(path, None) if version > 0 else None
    prior = prior_state["files"] if prior_state else {}
    if prior_state and prior_state["metadata"]:
        existing_pcols = tuple(
            prior_state["metadata"].get("partitionColumns") or ()
        )
        if partition_by is None:
            partition_by = existing_pcols
        elif tuple(partition_by) != existing_pcols:
            raise ValueError(
                f"partition_by {tuple(partition_by)} does not match the "
                f"table's pinned partition columns {existing_pcols}"
            )
    partition_by = tuple(partition_by or ())

    before_files = set(_rel_data_files(path))
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

    now_ms = int(time.time() * 1000)
    adds = []
    for rel in _rel_data_files(path):
        if rel in before_files:
            continue
        full = os.path.join(path, rel)
        adds.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": _partition_values(
                        rel, partition_by
                    ),
                    "size": os.path.getsize(full),
                    "modificationTime": now_ms,
                    "dataChange": True,
                }
            }
        )

    actions: list[dict] = []
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": list(partition_by),
                    "configuration": {},
                    "createdTime": now_ms,
                }
            }
        )
    if mode == "overwrite":
        for rel, add in prior.items():
            actions.append(
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                        "partitionValues": add.get("partitionValues", {}),
                    }
                }
            )
    actions.extend(adds)
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": mode.upper()},
                "engineInfo": "delta_lite/0.1",
            }
        }
    )
    _commit(path, version, actions)
    return version


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a delta_lite table (optionally a historical ``version`` —
    time travel by log replay). The active file set comes from the log;
    Spark's parquet reader with ``basePath`` reconstructs hive partition
    columns. Reads exactly the logged files — a data file present on
    disk but removed from the log (overwritten version) is invisible,
    which is the Delta read contract plain parquet directory listing
    cannot give."""
    state = _replay(path, version)
    files = state["files"]
    if not files:
        # an empty table still has a schema in metaData
        schema_json = state["metadata"]["schemaString"]
        from pyspark.sql.types import StructType

        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(schema_json))
        )
    # verify the spec's partitionValues agree with the hive path layout
    # (they are written together; disagreement means a corrupted table)
    pcols = state["metadata"]["partitionColumns"]
    for rel, add in files.items():
        from_path = _partition_values(rel, tuple(pcols))
        if from_path != add.get("partitionValues", {}):
            raise ValueError(
                f"partitionValues mismatch for {rel}: log says "
                f"{add.get('partitionValues')}, path says {from_path}"
            )
    paths = [os.path.join(path, rel) for rel in sorted(files)]
    return spark.read.option("basePath", path).parquet(*paths)


def table_history(path: str) -> list[dict]:
    """One record per version: version, operation, n_adds, n_removes —
    the DESCRIBE HISTORY surface."""
    out = []
    for v in _existing_versions(path):
        ops = {"version": v, "operation": None, "n_adds": 0, "n_removes": 0}
        with open(_version_file(path, v), encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    ops["n_adds"] += 1
                elif "remove" in action:
                    ops["n_removes"] += 1
                elif "commitInfo" in action:
                    ops["operation"] = action["commitInfo"].get("operation")
        out.append(ops)
    return out


def merge_delta(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
) -> int:
    """MERGE (upsert by ``key``): rows of ``updates`` replace same-key
    rows of the current table state; new keys append. Implemented as
    copy-on-write over the whole table — current-state anti-join + union,
    committed as one overwrite version with operation MERGE.

    Honest scale note: the real connector's MERGE prunes the rewrite to
    the FILES whose key ranges intersect the update set (file-level stats
    in the log); this minimal form rewrites the full table per merge, the
    right call only when updates touch most files. The engine-side merge
    semantics themselves (anti-join + union, exactly-once) are the proven
    ``cdc_merge_apply`` shape."""
    current = read_delta(spark, path)
    merged = current.join(
        updates.select(key).distinct(), on=key, how="left_anti"
    ).unionByName(updates)
    version = write_delta(merged, path, mode="overwrite")
    # relabel the commit operation (same file, same version — the log file
    # is already committed; rewrite in place is fine single-writer because
    # the version is claimed)
    vf = _version_file(path, version)
    lines = []
    with open(vf, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if "commitInfo" in action:
                action["commitInfo"]["operation"] = "MERGE"
            lines.append(json.dumps(action, separators=(",", ":")))
    tmp = os.path.join(_log_dir(path), f".{uuid.uuid4().hex}.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, vf)
    return version


def vacuum_delta(path: str, retain_versions: int = 1) -> list[str]:
    """Physically delete data files no longer referenced by any of the
    newest ``retain_versions`` versions — the retention cleanup that pairs
    with time travel (after vacuum, travel past the horizon fails because
    the files are GONE, exactly like the real VACUUM). Not a log commit
    (per the spec, vacuum does not change table state). Returns the
    deleted relative paths."""
    versions = _existing_versions(path)
    cp_version = _last_checkpoint_version(path)
    if not versions and cp_version is None:
        return []
    keep: set[str] = set()
    # the latest state is always retained (covers the checkpoint-only,
    # cleaned-up-log case where no JSON versions remain)
    keep.update(_replay(path, None)["files"])
    for v in versions[-max(retain_versions, 1):]:
        keep.update(_replay(path, v)["files"])
    deleted = []
    for rel in _rel_data_files(path):
        if rel not in keep:
            os.unlink(os.path.join(path, rel))
            deleted.append(rel)
    # prune now-empty data directories (never the log)
    for root, dirs, files in os.walk(path, topdown=False):
        dirs[:] = [d for d in dirs if d != "_delta_log"]
        if root != path and not os.listdir(root):
            os.rmdir(root)
    return sorted(deleted)


def checkpoint_delta(path: str, cleanup: bool = False) -> int:
    """Write a classic single-part checkpoint of the CURRENT state
    (``V.checkpoint.parquet`` + ``_last_checkpoint``) — the spec's log
    compaction. At real commit rates the JSON replay grows linearly with
    table age; a checkpoint bounds every subsequent read to one parquet
    footer + the commits since. With ``cleanup=True`` the JSON files at
    or below the checkpoint are deleted afterwards (the spec's log
    cleanup) — latest-state reads are unaffected, but time travel to a
    cleaned-up version correctly raises. Returns the checkpointed
    version."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    state = _replay(path, None)
    version = state["version"]
    md = state["metadata"]
    rows = [
        {
            "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
            "metaData": None,
            "add": None,
        },
        {"protocol": None, "metaData": md, "add": None},
    ]
    for add in state["files"].values():
        rows.append({"protocol": None, "metaData": None, "add": add})

    schema = pa.schema(
        [
            pa.field(
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                    ]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        (
                            "format",
                            pa.struct(
                                [
                                    ("provider", pa.string()),
                                    (
                                        "options",
                                        pa.map_(pa.string(), pa.string()),
                                    ),
                                ]
                            ),
                        ),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        (
                            "configuration",
                            pa.map_(pa.string(), pa.string()),
                        ),
                        ("createdTime", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        (
                            "partitionValues",
                            pa.map_(pa.string(), pa.string()),
                        ),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                    ]
                ),
            ),
        ]
    )

    def _mapify(d, keys):
        d = dict(d)
        for k in keys:
            if isinstance(d.get(k), dict):
                d[k] = list(d[k].items())
        return d

    norm = []
    for r in rows:
        r = dict(r)
        if r["metaData"]:
            m = _mapify(r["metaData"], ("configuration",))
            if isinstance(m.get("format"), dict):
                m["format"] = _mapify(m["format"], ("options",))
            norm.append({**r, "metaData": m})
        elif r["add"]:
            norm.append({**r, "add": _mapify(r["add"], ("partitionValues",))})
        else:
            norm.append(r)

    tmp = os.path.join(_log_dir(path), f".{uuid.uuid4().hex}.cp.tmp")
    pq.write_table(pa.Table.from_pylist(norm, schema=schema), tmp)
    os.replace(tmp, _checkpoint_file(path, version))
    lc_tmp = os.path.join(_log_dir(path), f".{uuid.uuid4().hex}.lc.tmp")
    with open(lc_tmp, "w", encoding="utf-8") as f:
        f.write(
            json.dumps({"version": version, "size": len(norm), "parts": 1})
            + "\n"
        )
    os.replace(lc_tmp, os.path.join(_log_dir(path), "_last_checkpoint"))
    if cleanup:
        for v in _existing_versions(path):
            if v <= version:
                os.unlink(_version_file(path, v))
    return version
