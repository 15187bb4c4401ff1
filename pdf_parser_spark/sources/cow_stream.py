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
Merge-on-read commits stream too: the step's delete keys prune the
carried files via the manifest's cached key bounds, so only files that
can hold a masked row are opened.
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
    def __init__(self, table_dir: str, version: int,
                 parent: int | None = None):
        self.table_dir = table_dir
        self.version = version
        # the commit this step diffs AGAINST — its parent on MAIN's
        # chain; None for pre-branch offsets (v-1 fallback at read)
        self.parent = parent


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


def _del_map(table_dir: str, dels: list[dict]) -> dict:
    """key -> max delete sequence across the listed equality-delete
    files (each is one CDC batch's keys, driver-sized by contract)."""
    import pyarrow.parquet as pq
    dm: dict = {}
    for e in dels:
        t = pq.read_table(os.path.join(table_dir, e["file"]))
        key_name = [n for n in t.schema.names if n != "__seq"][0]
        for k, s in zip(t.column(key_name).to_pylist(),
                        t.column("__seq").to_pylist()):
            if s > dm.get(k, -1):
                dm[k] = s
    return dm


def _load_rows(table_dir: str, files: list[str], names: list[str],
               manifest: dict, del_map: dict | None = None,
               key_filter: set | None = None):
    """LIVE rows of the listed files as a MULTISET (Counter) of
    hashable tuples in ``names`` order — matching the batch
    ``table_changes``'s exceptAll bag semantics; files missing a column
    (pre-add_column) contribute None. ``del_map`` masks rows whose key
    carries a delete sequence above the file's own sequence (merge-on-
    read equality deletes); ``key_filter`` keeps only those keys."""
    from collections import Counter

    import pyarrow.parquet as pq
    key_col = manifest["key_col"]
    kidx = names.index(key_col)
    seqs = manifest.get("seq", {})
    rows: Counter = Counter()
    for f in sorted(files):
        tbl = pq.read_table(os.path.join(table_dir, f))
        have = set(tbl.schema.names)
        fseq = int(seqs.get(f, 0))
        cols = [tbl.column(n).to_pylist() if n in have
                else [None] * tbl.num_rows for n in names]
        for tup in zip(*cols):
            if key_filter is not None and tup[kidx] not in key_filter:
                continue
            if del_map and del_map.get(tup[kidx], -1) > fseq:
                continue
            rows[tuple(_hashable(v) for v in tup)] += 1
    return rows


class CowChangesStreamReader(DataSourceStreamReader):
    def __init__(self, table_dir: str, starting_version: int | None,
                 declared_names: list[str]):
        self._dir = table_dir
        self._start = starting_version
        # the schema this STREAM declared at start — mid-stream schema
        # evolution must not change the shape of yielded tuples (the
        # running query's plan is bound to it); pinned here, not
        # re-read from the live manifest inside read()
        self._names = list(declared_names)

    def initialOffset(self) -> dict:
        v = self._start if self._start is not None \
            else _manifest(self._dir)["version"]
        return {"version": int(v)}

    def latestOffset(self) -> dict:
        return {"version": int(_manifest(self._dir)["version"])}

    def partitions(self, start: dict, end: dict):
        # one step per MAIN commit between the offsets, walked by
        # parent pointers: snapshot ids are global across branches, so
        # consecutive ids need not be consecutive MAIN commits — a
        # naive v-1 walk would leak unpublished branch staging
        # snapshots into the stream
        from pdf_parser_spark.sources.cowtable import _ancestry
        m = _manifest(self._dir)
        chain = _ancestry(m, end["version"])
        if start["version"] not in chain:
            raise ValueError(
                f"offset v{start['version']} is not an ancestor of "
                f"v{end['version']} — vacuumed gap or a rewound ref; "
                "restart the stream from a retained version")
        steps = list(reversed(chain[:chain.index(start["version"])]))
        parent = start["version"]
        out = []
        for v in steps:
            out.append(_Step(self._dir, v, parent))
            parent = v
        return out

    def read(self, partition: _Step):
        m = _manifest(partition.table_dir)
        v = partition.version
        pv = partition.parent if partition.parent is not None else v - 1
        snap = m["snapshots"].get(str(v))
        prev = m["snapshots"].get(str(pv))
        if snap is None or prev is None:
            raise ValueError(f"version {v} (or {pv}) vacuumed — its "
                             "changelog is gone; restart the stream "
                             "from a retained version")
        # the DIFF runs under the commit-time schema (a later drop_column
        # must not rewrite history to "no change"); the yielded rows are
        # PROJECTED BY NAME to the schema the STREAM declared at start —
        # columns since dropped vanish, columns since added read None;
        # a mid-stream add/drop cannot change tuple arity or silently
        # re-bind a position to a different column (restart the query
        # to pick up an evolved schema)
        sj = snap.get("schema", m.get("schema"))
        step_names = [f["name"] for f in json.loads(sj)["fields"]]
        cur_names = self._names
        old = set(prev["files"])
        new = set(snap["files"])
        d = partition.table_dir
        prev_dels = prev.get("deletes") or []
        cur_dels = snap.get("deletes") or []
        prev_del_names = {e["file"] for e in prev_dels}
        new_dels = [e for e in cur_dels
                    if e["file"] not in prev_del_names]
        pd_map = _del_map(d, prev_dels) if prev_dels else None
        if new_dels:
            # merge-on-read commit: newly-masked rows live in CARRIED
            # files — prune those by the manifest's cached key bounds
            # against the step's delete keys, read only the survivors
            nd_map = _del_map(d, new_dels)
            stats = m.get("stats", {})
            dkeys = sorted(nd_map)
            carried = sorted(old & new)
            cand = []
            for f in carried:
                st = stats.get(f)
                if st is None:
                    cand.append(f)
                    continue
                import bisect
                i = bisect.bisect_left(dkeys, st[0])
                if i < len(dkeys) and dkeys[i] <= st[1]:
                    cand.append(f)
            o = _load_rows(d, sorted(old - new), step_names, m,
                           del_map=pd_map)
            o.update(_load_rows(d, cand, step_names, m, del_map=pd_map,
                                key_filter=set(nd_map)))
            n = _load_rows(d, sorted(new - old), step_names, m)
        else:
            cd_map = _del_map(d, cur_dels) if cur_dels else None
            o = _load_rows(d, sorted(old - new), step_names, m,
                           del_map=pd_map)
            n = _load_rows(d, sorted(new - old), step_names, m,
                           del_map=cd_map)

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
        change = {f.name for f in _CHANGE_COLS}
        names = [f.name for f in schema.fields if f.name not in change]
        return CowChangesStreamReader(self._table_dir(),
                                      int(sv) if sv is not None else None,
                                      names)
