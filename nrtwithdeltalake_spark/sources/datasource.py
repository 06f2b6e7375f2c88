"""``versioned`` — a Spark 4 Python DataSource exposing VersionedTable
as a first-class format:

* batch: ``spark.read.format("versioned").option("path", p).load()``
  (plus ``option("version", n)`` time travel) — one input partition per
  data FILE, so the scan parallelizes exactly like the native reader;
  rows ship as Arrow RecordBatches, never per-row Python tuples;
* streaming: ``spark.readStream.format("versioned").option("path", p)
  .option("feed", "changes").load()`` — a change-feed tail whose OFFSET
  IS THE COMMIT VERSION: each micro-batch is precisely the CDF of the
  commits in ``(start, end]``, giving the schedulerless NRT CDC source
  (O20/O31) as a named format instead of a file-glob workaround.

This is the connector story the reference delegates to Databricks'
``spark.read.format("delta")`` (``COPY_MSQL_TO_SILVER.py:193,200``),
restated through the public DataSource V2 Python API
(``pyspark.sql.datasource``). The log is plain JSON + parquet, so the
DataSource needs no SparkSession — schema and planning are driver-side
file metadata reads, the same cost profile as the native path.

Scale notes: partition planning is O(files) metadata; each partition
reads one parquet file via pyarrow and yields its record batches
(Arrow end-to-end — the Python layer never touches rows). Schema
evolution is honored the same way ``VersionedTable._read_files`` does
it: carried-over files physically missing newer columns yield nulls.
The native ``VersionedTable.read`` path stays the hot path (JVM parquet
scan with pushdown); this format exists for ecosystem addressability —
anything that can name a Spark format can now read the table.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

CHANGE_TYPE_COL = "_change_type"
VERSION_COL = "_commit_version"


def _log_dir(path: str) -> str:
    return os.path.join(os.path.abspath(path), "_log")


def _versions(path: str) -> list[int]:
    return sorted(
        int(f[: -len(".json")])
        for f in os.listdir(_log_dir(path))
        if f.endswith(".json")
    )


def _commit(path: str, version: int) -> dict:
    with open(os.path.join(_log_dir(path), f"{version:020d}.json")) as f:
        return json.loads(f.read())


@dataclass
class _FilePartition(InputPartition):
    file: str
    schema_json: str
    extra: tuple = ()  # ((colname, value), ...) appended constants


def _arrow_batches(part: _FilePartition):
    """One parquet file → aligned Arrow batches: project to the commit
    schema by NAME, null-fill columns the file predates (schema
    evolution), append constant columns (the CDF's commit version)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_type

    want = T.StructType.fromJson(json.loads(part.schema_json))
    tbl = pq.read_table(part.file)
    n = tbl.num_rows
    cols = []
    names = []
    for f in want.fields:
        names.append(f.name)
        at = to_arrow_type(f.dataType)
        if f.name in tbl.column_names:
            col = tbl.column(f.name)
            if col.type != at:
                col = col.cast(at)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, type=at))
    for cname, cval in part.extra:
        names.append(cname)
        cols.append(pa.array([cval] * n, type=pa.int64()))
    out = pa.table(dict(zip(names, cols)))
    for batch in out.to_batches():
        yield batch


class _BatchReader(DataSourceReader):
    def __init__(self, path: str, version: int | None):
        self.path = path
        self.version = version

    def partitions(self):
        vs = _versions(self.path)
        v = self.version if self.version is not None else vs[-1]
        c = _commit(self.path, v)
        return [
            _FilePartition(file=f, schema_json=c["schema_json"])
            for f in c["files"]
        ] or [
            # empty table: one empty partition keeps the scan well-formed
            _FilePartition(file="", schema_json=c["schema_json"])
        ]

    def read(self, partition: _FilePartition):
        if not partition.file:
            return iter(())
        return _arrow_batches(partition)


class _ChangeFeedStreamReader(SimpleDataSourceStreamReader):
    """Offsets are commit versions: {'version': v} means 'everything
    through commit v has been delivered'. readBetweenOffsets replays
    exactly the CDF files of (start, end] — deterministic, so Spark's
    at-least-once replay of an uncommitted batch yields identical
    data."""

    def __init__(self, path: str, start_version: int, row_schema: T.StructType):
        self.path = path
        self.start_version = start_version
        # declared output schema minus the appended version column: every
        # commit's CDF aligns to THIS (older files null-fill newer columns)
        self.row_schema_json = T.StructType(
            [f for f in row_schema.fields if f.name != VERSION_COL]
        ).json()

    def initialOffset(self):
        return {"version": self.start_version}

    def _rows_between(self, lo: int, hi: int):
        for v in _versions(self.path):
            if not (lo < v <= hi):
                continue
            c = _commit(self.path, v)
            for f in c.get("cdf_files", []):
                part = _FilePartition(
                    file=f,
                    schema_json=self.row_schema_json,
                    extra=((VERSION_COL, v),),
                )
                for batch in _arrow_batches(part):
                    for row in batch.to_pylist():
                        yield tuple(row.values())

    def read(self, start: dict):
        latest = _versions(self.path)[-1]
        lo = start["version"]
        if latest <= lo:
            return iter(()), start
        # materialized (picklable): the harness prefetches and caches the
        # batch so an uncommitted-epoch replay is byte-identical
        return iter(list(self._rows_between(lo, latest))), {"version": latest}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows_between(start["version"], end["version"])))


@dataclass
class _WriteResult(WriterCommitMessage):
    data_file: str | None
    cdf_file: str | None
    rows: int


def _write_task_files(path: str, iterator) -> _WriteResult:
    """Executor half of the write protocols: stream this task's Arrow
    batches into one immutable data file + one insert-image CDF file.
    Files become live only if a later driver commit references them."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    batches = [b for b in iterator if b.num_rows]
    if not batches:
        return _WriteResult(None, None, 0)
    tbl = pa.Table.from_batches(batches)
    token = uuid.uuid4().hex
    data_dir = os.path.join(path, "_data", f"ds-{token}")
    cdf_dir = os.path.join(path, "_cdf", f"ds-{token}")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(cdf_dir, exist_ok=True)
    data_file = os.path.join(data_dir, "part-00000.parquet")
    cdf_file = os.path.join(cdf_dir, "part-00000.parquet")
    pq.write_table(tbl, data_file)
    pq.write_table(
        tbl.append_column(CHANGE_TYPE_COL, pa.array(["insert"] * tbl.num_rows)),
        cdf_file,
    )
    return _WriteResult(data_file, cdf_file, tbl.num_rows)


def _drop_files(messages) -> None:
    for m in messages:
        if m is None:
            continue
        for f in (m.data_file, m.cdf_file):
            if f and os.path.exists(f):
                os.remove(f)


class _VersionedWriter(DataSourceArrowWriter):
    """Distributed write with an atomic driver-side commit — the
    DataSource V2 writer protocol mapped 1:1 onto the table format's
    own commit protocol:

    * each write TASK streams its Arrow batches into one immutable
      parquet data file plus one insert-image CDF file (no row ever
      passes through the driver);
    * ``commit(messages)`` publishes ONE commit record referencing the
      task files — rename-atomic, so a failed/duplicated task attempt
      leaves only invisible garbage (Spark retries tasks; only the
      files named in the committed messages become live);
    * ``abort()`` deletes whatever the failed attempt wrote.

    Refused (use the native ``VersionedTable`` API, which holds a
    SparkSession): tables with CHECK constraints (enforcement needs a
    validation scan) and registered tables (the catalog sync needs DDL).
    ``mode("overwrite")`` emits delete pre-images for the previous
    snapshot to the change feed — converted file-by-file on the driver
    via pyarrow (delta-sized driver IO; the JVM-path ``overwrite()``
    remains the hot path for large replaces)."""

    def __init__(self, path: str, schema: T.StructType, overwrite: bool):
        self.path = os.path.abspath(path)
        self.schema_json = schema.json()
        self.overwrite = overwrite
        if os.path.exists(os.path.join(self.path, "_constraints.json")):
            raise ValueError(
                "format('versioned') write path cannot enforce CHECK "
                "constraints; use VersionedTable.append/overwrite"
            )
        if os.path.exists(os.path.join(self.path, "_registration.json")):
            raise ValueError(
                "table is catalog-registered; the registration sync needs "
                "a SparkSession — use VersionedTable.append/overwrite"
            )

    # -- executor side ------------------------------------------------------

    def write(self, iterator):
        return _write_task_files(self.path, iterator)

    # -- driver side ----------------------------------------------------------

    def _publish(self, record: dict) -> None:
        import tempfile

        log = _log_dir(self.path)
        os.makedirs(log, exist_ok=True)
        target = os.path.join(log, f"{record['version']:020d}.json")
        if os.path.exists(target):
            raise RuntimeError(
                f"concurrent write detected: version {record['version']} exists"
            )
        fd, tmp = tempfile.mkstemp(dir=log, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps(record))
        os.rename(tmp, target)

    def _delete_preimages(self, prev: dict) -> list[str]:
        """Overwrite CDF: previous snapshot rows re-emitted as deletes,
        one CDF file per previous data file (pyarrow, driver-local)."""
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        out = []
        for f in prev["files"]:
            part = _FilePartition(file=f, schema_json=prev["schema_json"])
            batches = list(_arrow_batches(part))
            if not batches:
                continue
            tbl = pa.Table.from_batches(batches)
            d = os.path.join(self.path, "_cdf", f"ds-{uuid.uuid4().hex}")
            os.makedirs(d, exist_ok=True)
            dst = os.path.join(d, "part-00000.parquet")
            pq.write_table(
                tbl.append_column(
                    CHANGE_TYPE_COL, pa.array(["delete"] * tbl.num_rows)
                ),
                dst,
            )
            out.append(dst)
        return out

    def commit(self, messages):
        import time

        new_files = sorted(m.data_file for m in messages if m.data_file)
        new_cdf = sorted(m.cdf_file for m in messages if m.cdf_file)
        exists = os.path.isdir(_log_dir(self.path)) and _versions(self.path)
        if not exists:
            self._publish(
                {
                    "version": 0,
                    "op": "create",
                    "files": new_files,
                    "cdf_files": new_cdf,
                    "schema_json": self.schema_json,
                    "ts": time.time(),
                    "stats": {},
                }
            )
            return
        prev = _commit(self.path, _versions(self.path)[-1])
        prev_schema = T.StructType.fromJson(json.loads(prev["schema_json"]))
        new_schema = T.StructType.fromJson(json.loads(self.schema_json))
        prev_names = {f.name: f for f in prev_schema.fields}
        for f in new_schema.fields:
            if f.name in prev_names and prev_names[f.name].dataType != f.dataType:
                raise ValueError(
                    f"type change for column '{f.name}' "
                    f"({prev_names[f.name].dataType} → {f.dataType}) — "
                    "evolve via VersionedTable"
                )
        # append-style evolution: previous columns keep their order, new
        # columns append; the read path null-fills by name either way
        merged = T.StructType(
            list(prev_schema.fields)
            + [f for f in new_schema.fields if f.name not in prev_names]
        )
        stats: dict = {}
        if self.overwrite:
            files = new_files
            cdf = self._delete_preimages(prev) + new_cdf
            op = "overwrite"
        else:
            files = list(prev["files"]) + new_files
            cdf = new_cdf
            op = "append"
            kept = {
                f: s
                for f, s in (prev.get("stats", {}).get("file_stats") or {}).items()
                if f in set(prev["files"])
            }
            if kept:
                stats["file_stats"] = kept
        if prev.get("stats", {}).get("txn"):
            stats["txn"] = dict(prev["stats"]["txn"])
        self._publish(
            {
                "version": prev["version"] + 1,
                "op": op,
                "files": files,
                "cdf_files": cdf,
                "schema_json": merged.json(),
                "ts": time.time(),
                "stats": stats,
            }
        )

    def abort(self, messages):
        _drop_files(messages)


_STREAM_TXN_APP = "__versioned_stream_sink"


class _VersionedStreamWriter(DataSourceStreamArrowWriter):
    """Streaming sink: every micro-batch is one append commit, made
    exactly-once by the same writer-transaction watermark the native
    API uses (``txn_app``/``txn_version``): the epoch id rides the
    commit's txn stats, and a replayed epoch (restart from checkpoint
    between sink commit and engine commit) is detected on the driver —
    its freshly written task files are deleted as garbage instead of
    committed twice."""

    def __init__(self, path: str, schema: T.StructType):
        self.path = os.path.abspath(path)
        self.schema_json = schema.json()
        if os.path.exists(os.path.join(self.path, "_constraints.json")):
            raise ValueError(
                "format('versioned') stream sink cannot enforce CHECK "
                "constraints; use foreachBatch + VersionedTable"
            )
        if os.path.exists(os.path.join(self.path, "_registration.json")):
            raise ValueError(
                "table is catalog-registered; use foreachBatch + VersionedTable"
            )

    def write(self, iterator):
        return _write_task_files(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:
        import time

        new_files = sorted(m.data_file for m in messages if m and m.data_file)
        new_cdf = sorted(m.cdf_file for m in messages if m and m.cdf_file)
        exists = os.path.isdir(_log_dir(self.path)) and _versions(self.path)
        if not exists:
            import tempfile

            log = _log_dir(self.path)
            os.makedirs(log, exist_ok=True)
            record = {
                "version": 0,
                "op": "create",
                "files": new_files,
                "cdf_files": new_cdf,
                "schema_json": self.schema_json,
                "ts": time.time(),
                "stats": {"txn": {_STREAM_TXN_APP: batchId}},
            }
            target = os.path.join(log, f"{0:020d}.json")
            fd, tmp = tempfile.mkstemp(dir=log, suffix=".tmp")
            with os.fdopen(fd, "w") as f:
                f.write(json.dumps(record))
            os.rename(tmp, target)
            return
        prev = _commit(self.path, _versions(self.path)[-1])
        seen = (prev.get("stats", {}).get("txn") or {}).get(_STREAM_TXN_APP)
        if seen is not None and batchId <= seen:
            _drop_files(messages)  # replayed epoch: structural no-op
            return
        stats: dict = {"txn": dict(prev.get("stats", {}).get("txn") or {})}
        stats["txn"][_STREAM_TXN_APP] = batchId
        kept = {
            f: s
            for f, s in (prev.get("stats", {}).get("file_stats") or {}).items()
            if f in set(prev["files"])
        }
        if kept:
            stats["file_stats"] = kept
        import tempfile

        record = {
            "version": prev["version"] + 1,
            "op": "append",
            "files": list(prev["files"]) + new_files,
            "cdf_files": new_cdf,
            "schema_json": prev["schema_json"],
            "ts": time.time(),
            "stats": stats,
        }
        log = _log_dir(self.path)
        target = os.path.join(log, f"{record['version']:020d}.json")
        if os.path.exists(target):
            raise RuntimeError(
                f"concurrent write detected: version {record['version']} exists"
            )
        fd, tmp = tempfile.mkstemp(dir=log, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps(record))
        os.rename(tmp, target)

    def abort(self, messages, batchId: int) -> None:
        _drop_files(messages)


class VersionedTableDataSource(DataSource):
    """Format name ``versioned``. Options: ``path`` (required),
    ``version`` (batch time travel), ``feed=changes`` +
    ``startingVersion`` (streaming CDF tail); writable via
    ``df.write.format("versioned").mode("append"|"overwrite")``."""

    @classmethod
    def name(cls) -> str:
        return "versioned"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("option 'path' is required for format 'versioned'")
        return p

    def schema(self):
        path = self._path()
        v = self.options.get("version")
        vs = _versions(path)
        ver = int(v) if v is not None else vs[-1]
        base = T.StructType.fromJson(
            json.loads(_commit(path, ver)["schema_json"])
        )
        if self.options.get("feed") == "changes":
            return base.add(CHANGE_TYPE_COL, T.StringType()).add(
                VERSION_COL, T.LongType()
            )
        return base

    def reader(self, schema):
        v = self.options.get("version")
        return _BatchReader(self._path(), int(v) if v is not None else None)

    def writer(self, schema, overwrite: bool):
        return _VersionedWriter(self._path(), schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return _VersionedStreamWriter(self._path(), schema)

    def simpleStreamReader(self, schema):
        if self.options.get("feed") != "changes":
            raise ValueError(
                "streaming requires option 'feed'='changes' (CDF tail)"
            )
        start = int(self.options.get("startingVersion", -1))
        return _ChangeFeedStreamReader(self._path(), start, schema)


def register(spark) -> None:
    spark.dataSource.register(VersionedTableDataSource)
