"""`spark.readStream.format("cow_changes")` — the changelog as a stream.

A Spark 4 Python streaming data source (pyspark.sql.datasource) over the
copy-on-write table's commit log: offsets ARE snapshot versions, each
micro-batch covers the version steps committed since the last trigger,
and every step becomes one input partition whose task reads ONLY the
files the two manifests do not share by name (the same pruning as the
batch ``cowtable.table_changes``). This is Delta CDF's
``readChangeFeed`` shape rebuilt on the manifest:

    spark.dataSource.register(CowChangesDataSource)
    (spark.readStream.format("cow_changes")
          .option("path", table_dir)
          .option("starting_version", 1)     # default: table's current
          .load())                            # rows + change_type
                                              #      + commit_version

Checkpoint resume is Spark's own offset management — the reader never
stores state; a restarted query continues from the committed version.

Scale note: one step's diff runs INSIDE one task (pyarrow row diff of
the step's changed files) — right for CDC-sized commits, which is what
a changelog stream consumes; a bulk backfill over huge rewrites should
use the distributed batch ``table_changes`` instead. Rows with list
columns are diffed via hashable tuples and yielded back as lists.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

_CHANGE_COLS = [StructField("change_type", StringType()),
                StructField("commit_version", IntegerType())]


def _manifest(table_dir: str) -> dict:
    with open(os.path.join(table_dir, "manifest.json")) as fh:
        return json.load(fh)


class _Step(InputPartition):
    def __init__(self, table_dir: str, version: int):
        self.table_dir = table_dir
        self.version = version


# NaN sentinel: NaN != NaN would stop unchanged float rows from
# cancelling in the diff; identity is consistent within one task, and
# both diff sides are built in the same read() call
_NAN = object()


def _hashable(v):
    if isinstance(v, (list, tuple)):
        return tuple(_hashable(x) for x in v)
    if isinstance(v, float) and v != v:
        return _NAN
    return v


def _unhash(v):
    if v is _NAN:
        return float("nan")
    if isinstance(v, tuple):
        return [_unhash(x) for x in v]
    return v


def _load_rows(table_dir: str, files: list[str], names: list[str]):
    """All rows of the listed files as a MULTISET (Counter) of hashable
    tuples in ``names`` order — matching the batch ``table_changes``'s
    exceptAll bag semantics; files missing a column (pre-add_column)
    contribute None."""
    from collections import Counter

    import pyarrow.parquet as pq
    rows: Counter = Counter()
    for f in sorted(files):
        tbl = pq.read_table(os.path.join(table_dir, f))
        have = set(tbl.schema.names)
        cols = [tbl.column(n).to_pylist() if n in have
                else [None] * tbl.num_rows for n in names]
        for tup in zip(*cols):
            rows[tuple(_hashable(v) for v in tup)] += 1
    return rows


class CowChangesStreamReader(DataSourceStreamReader):
    def __init__(self, table_dir: str, starting_version: int | None):
        self._dir = table_dir
        self._start = starting_version

    def initialOffset(self) -> dict:
        v = self._start if self._start is not None \
            else _manifest(self._dir)["version"]
        return {"version": int(v)}

    def latestOffset(self) -> dict:
        return {"version": int(_manifest(self._dir)["version"])}

    def partitions(self, start: dict, end: dict):
        return [_Step(self._dir, v)
                for v in range(start["version"] + 1, end["version"] + 1)]

    def read(self, partition: _Step):
        m = _manifest(partition.table_dir)
        v = partition.version
        snap = m["snapshots"].get(str(v))
        prev = m["snapshots"].get(str(v - 1))
        if snap is None or prev is None:
            raise ValueError(f"version {v} (or {v - 1}) vacuumed — its "
                             "changelog is gone; restart the stream "
                             "from a retained version")
        # the DIFF runs under the commit-time schema (a later drop_column
        # must not rewrite history to "no change"); the yielded rows are
        # PROJECTED BY NAME to the current schema the source declares —
        # columns since dropped vanish, columns since added read None
        sj = snap.get("schema", m.get("schema"))
        step_names = [f["name"] for f in json.loads(sj)["fields"]]
        cur_names = [f["name"]
                     for f in json.loads(m["schema"])["fields"]]
        old = set(prev["files"])
        new = set(snap["files"])
        o = _load_rows(partition.table_dir, sorted(old - new), step_names)
        n = _load_rows(partition.table_dir, sorted(new - old), step_names)

        def project(row: tuple) -> tuple:
            d = dict(zip(step_names, row))
            return tuple(_unhash(d.get(c)) for c in cur_names)

        for row, cnt in sorted((n - o).items(), key=lambda kv: repr(kv[0])):
            for _ in range(cnt):
                yield project(row) + ("insert", v)
        for row, cnt in sorted((o - n).items(), key=lambda kv: repr(kv[0])):
            for _ in range(cnt):
                yield project(row) + ("delete", v)

    def commit(self, end: dict) -> None:
        pass


class CowChangesDataSource(DataSource):
    """See module docstring. Options: ``path`` (table dir, required),
    ``starting_version`` (stream from this committed version; default =
    the table's current version, i.e. only NEW commits)."""

    @classmethod
    def name(cls) -> str:
        return "cow_changes"

    def _table_dir(self) -> str:
        d = self.options.get("path")
        if not d:
            raise ValueError("cow_changes needs .option('path', table_dir)")
        return d

    def schema(self) -> StructType:
        base = StructType.fromJson(
            json.loads(_manifest(self._table_dir())["schema"]))
        return StructType(base.fields + _CHANGE_COLS)

    def streamReader(self, schema: StructType) -> CowChangesStreamReader:
        sv = self.options.get("starting_version")
        return CowChangesStreamReader(self._table_dir(),
                                      int(sv) if sv is not None else None)
