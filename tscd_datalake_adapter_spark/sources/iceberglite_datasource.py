"""Custom Python STREAMING DataSource (Spark 4 DataSource API):
``iceberglite`` — a Structured Streaming SOURCE over an ``iceberg_lite``
table, the format twin of ``deltalite_datasource`` (one engine surface,
both table formats streamable).

    spark.dataSource.register(IcebergLiteStreamDataSource)
    stream = (spark.readStream.format("iceberglite")
              .option("path", table_path)
              .option("operations", "INGEST")        # optional filter
              .option("skip_non_append", "false")    # default false
              .load())

Offsets are SEQUENCE NUMBERS (``{"seq": N}`` = consumed through N) — the
spec's monotone per-commit counter, so like the delta twin the source
needs no sidecar state: the table metadata is the durable offset ledger.
Each micro-batch is the spec's INCREMENTAL APPEND SCAN of the snapshots
in ``(start, end]`` (the batch twin is
:func:`iceberg_lite.read_iceberg_incremental`): manifest entries with
status=ADDED and the snapshot's own sequence number, one executor task
per data file, rows stamped ``_snapshot_id`` / ``_committed_at_ms``.

A non-append snapshot in range (overwrite/MERGE rewrite) fails the
stream loudly unless ``skip_non_append=true``; ``operations`` filters by
the engine's summary label (e.g. INGEST) — snapshots not matching are
skipped entirely. Identity partition values (path-encoded, not in the
data files) are reconstructed ON THE EXECUTOR and typed per the schema;
transform-derived path segments are metadata-only and ignored.

Schema-evolution contract (r11, pinned by test, same as the deltalite
twin): a running query's schema is FIXED — a snapshot in range whose
``schema-id`` resolves to a different schema fails the stream loudly;
restart with a fresh checkpoint to stream under the new schema.

Rollback contract (r11, pinned by test): the stream follows the
CURRENT LINEAGE via ``parent-snapshot-id`` — snapshots rolled back out
of the lineage are SKIPPED (their rows are not table state; emitting
them would be phantom replay), and their later expiry is likewise
ignored; only an expired snapshot the lineage actually needed raises.

Same trigger caveat as the other Python sources: no AvailableNow —
drive with a processingTime trigger + ``processAllAvailable()``.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class IcebergLiteFilePartition(InputPartition):
    """One ADDED data file of one snapshot. Picklable plain attributes."""

    def __init__(
        self,
        data_root: str,
        file_path: str,
        snapshot_id: int,
        ts_ms: int,
        identity_pcols: tuple,
        identity_ptypes: tuple,
        field_names: tuple,
    ):
        self.data_root = data_root
        self.file_path = file_path
        self.snapshot_id = snapshot_id
        self.ts_ms = ts_ms
        self.identity_pcols = identity_pcols
        self.identity_ptypes = identity_ptypes
        self.field_names = field_names


def _typed_identity_value(v: str | None, ice_type: str):
    if v is None:
        return None
    if ice_type in ("int", "long"):
        return int(v)
    if ice_type in ("double", "float"):
        return float(v)
    if ice_type == "boolean":
        return v == "true"
    return v


class IcebergLiteStreamReader(DataSourceStreamReader):
    def __init__(self, options, declared_fields: tuple | None = None):
        self._path = options.get("path")
        if not self._path:
            raise ValueError(
                "iceberglite source requires .option('path', …)"
            )
        # (name, type) pairs of the TABLE schema the stream was declared
        # with — snapshots in range whose schema-id resolves to a
        # different schema fail the stream loudly (module docstring)
        self._declared_fields = declared_fields
        ops = options.get("operations")
        self._operations = (
            tuple(s.strip() for s in ops.split(",") if s.strip())
            if ops
            else None
        )
        self._skip_non_append = (
            options.get("skip_non_append", "false").lower() == "true"
        )

    def initialOffset(self):
        return {"seq": 0}  # sequence numbers start at 1

    def latestOffset(self):
        from tscd_datalake_adapter_spark.sources.iceberg_lite import (
            load_metadata,
        )

        return {"seq": load_metadata(self._path)["last-sequence-number"]}

    def partitions(self, start, end):
        from tscd_datalake_adapter_spark.sources import avro_lite
        from tscd_datalake_adapter_spark.sources.iceberg_lite import (
            _ancestry,
            _current_schema,
            _current_spec,
            _snapshot_is_append,
            _transform_of_spec_field,
            load_metadata,
        )

        s, e = int(start["seq"]), int(end["seq"])
        if e <= s:
            return []
        meta = load_metadata(self._path)
        # the stream follows the CURRENT LINEAGE (parent chain): after a
        # rollback, abandoned snapshots are retained but their rows are
        # not table state — emitting them would be phantom replay (r11
        # review fix). A sequence number in range is therefore:
        #   - on the lineage → emitted (subject to the filters below);
        #   - retained but OFF the lineage (rolled back) → skipped, its
        #     rows were never emitted and never will be;
        #   - absent and BELOW the oldest lineage member → possibly an
        #     expired-unconsumed lineage snapshot: data loss, raise
        #     (commits allocate seqs contiguously along the lineage);
        #   - absent and at/above the oldest lineage member → provably
        #     off-lineage (the connected parent chain skipped it), safe
        #     to skip.
        lineage = _ancestry(meta)
        lineage_seqs = {sn["sequence-number"] for sn in lineage}
        retained_seqs = {sn["sequence-number"] for sn in meta["snapshots"]}
        oldest = min(lineage_seqs) if lineage_seqs else None
        lost = sorted(
            v
            for v in range(s + 1, e + 1)
            if v not in lineage_seqs
            and v not in retained_seqs
            and (oldest is None or v < oldest)
        )
        if lost:
            raise ValueError(
                f"sequence numbers {lost} were expired by "
                "expire_snapshots before the stream consumed them; the "
                "stream cannot replay them"
            )
        schema = _current_schema(meta)
        field_names = tuple(f["name"] for f in schema["fields"])
        descs = [
            _transform_of_spec_field(pf, schema)
            for pf in _current_spec(meta)["fields"]
        ]
        identity = [
            (d["name"], d["source_type"])
            for d in descs
            if d["transform"] == "identity"
        ]
        pcols = tuple(n for n, _ in identity)
        ptypes = tuple(t for _, t in identity)
        data_root = os.path.join(self._path, "data")
        parts: list[IcebergLiteFilePartition] = []
        schemas_by_id = {
            sc["schema-id"]: sc for sc in meta["schemas"]
        }
        for snap in lineage:
            seq = snap["sequence-number"]
            if not (s < seq <= e):
                continue
            if self._declared_fields is not None:
                snap_schema = schemas_by_id.get(
                    snap.get("schema-id"), schema
                )
                got = tuple(
                    (f["name"], f["type"])
                    for f in snap_schema["fields"]
                )
                if got != self._declared_fields:
                    raise ValueError(
                        f"snapshot {snap['snapshot-id']} (seq {seq}) "
                        f"was written under an evolved schema {got}; "
                        f"the stream declared {self._declared_fields} "
                        "— a running query's schema is fixed; restart "
                        "the stream (fresh checkpoint) to pick up the "
                        "new schema"
                    )
            summary = snap["summary"]
            if (
                self._operations is not None
                and summary["operation"] not in self._operations
            ):
                continue
            if not _snapshot_is_append(meta, snap):
                if self._skip_non_append:
                    continue
                raise ValueError(
                    f"snapshot {snap['snapshot-id']} (seq {seq}) is "
                    f"{summary['operation']!r}, not an append; set "
                    ".option('skip_non_append','true') or filter with "
                    ".option('operations', …)"
                )
            _, manifests = avro_lite.read_container(snap["manifest-list"])
            for m in manifests:
                if m["sequence_number"] != seq:
                    continue  # reused manifest: entries predate snap
                _, entries = avro_lite.read_container(m["manifest_path"])
                for entry in entries:
                    if (
                        entry["status"] != 1
                        or entry["snapshot_id"] != snap["snapshot-id"]
                    ):
                        continue
                    parts.append(
                        IcebergLiteFilePartition(
                            data_root,
                            entry["data_file"]["file_path"],
                            snap["snapshot-id"],
                            int(snap["timestamp-ms"]),
                            pcols,
                            ptypes,
                            field_names,
                        )
                    )
        return parts

    def read(self, partition):
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file_path)
        cols = set(table.column_names)
        rel = os.path.relpath(partition.file_path, partition.data_root)
        pvals = {}
        for seg in rel.split(os.sep)[:-1]:
            if "=" in seg:
                k, val = seg.split("=", 1)
                pvals[k] = val
        consts = {
            c: _typed_identity_value(pvals.get(c), t)
            for c, t in zip(
                partition.identity_pcols, partition.identity_ptypes
            )
        }
        out = []
        for r in table.to_pylist():
            out.append(
                tuple(
                    r[name] if name in cols else consts.get(name)
                    for name in partition.field_names
                )
                + (partition.snapshot_id, partition.ts_ms)
            )
        return iter(out)

    def commit(self, end):
        pass  # the query checkpoint owns progress


class IcebergLiteStreamDataSource(DataSource):
    @classmethod
    def name(cls):
        return "iceberglite"

    def schema(self):
        from pyspark.sql.types import LongType, StructField, StructType

        from tscd_datalake_adapter_spark.sources.iceberg_lite import (
            _spark_schema_of,
            load_metadata,
        )

        base = _spark_schema_of(load_metadata(self.options["path"]))
        return StructType(
            base.fields
            + [
                StructField("_snapshot_id", LongType()),
                StructField("_committed_at_ms", LongType()),
            ]
        )

    def streamReader(self, schema):
        from tscd_datalake_adapter_spark.sources.iceberg_lite import (
            _current_schema,
            load_metadata,
        )

        cur = _current_schema(load_metadata(self.options["path"]))
        declared = tuple(
            (f["name"], f["type"]) for f in cur["fields"]
        )
        return IcebergLiteStreamReader(self.options, declared)
