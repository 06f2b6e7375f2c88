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
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
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


class VersionedTableDataSource(DataSource):
    """Format name ``versioned``. Options: ``path`` (required),
    ``version`` (batch time travel), ``feed=changes`` +
    ``startingVersion`` (streaming CDF tail)."""

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

    def simpleStreamReader(self, schema):
        if self.options.get("feed") != "changes":
            raise ValueError(
                "streaming requires option 'feed'='changes' (CDF tail)"
            )
        start = int(self.options.get("startingVersion", -1))
        return _ChangeFeedStreamReader(self._path(), start, schema)


def register(spark) -> None:
    spark.dataSource.register(VersionedTableDataSource)
