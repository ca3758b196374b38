"""Native WARC DataSource — `spark.read.format("warc").load(dir)`.

(SURVEY §2.1 S15 / §2.13 crawl pipeline.) The reference consumes crawl
archives file-by-file; this exposes the repo's from-scratch WARC
parser (functions/warc.py, ISO 28500 incl. Common Crawl's per-record
gzip members) as a first-class Spark source via the Python DataSource
API — the same surface the priority-queue source uses
(io/queue_source.py).

Scale shape: one InputPartition per .warc/.warc.gz file. That is
exactly the Common Crawl layout (~1 GB independently-readable segment
files), so a 100 TB crawl fans out to ~100k parallel partitions with
no shuffle, no coordination, and per-file dead-lettering: a malformed
file raises ValueError inside its own partition only. Record parsing
stays streaming within the partition (records yielded as parsed).

Schema mirrors np_parse_warc's record dict; `body` is binary (opaque
multimodal column per the repo's convention) and the HTTP fields are
pre-split for response records so the HTML->text stage (q144) can run
as pure column expressions downstream.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "date string, content_type string, content_length long, "
    "http_status int, http_content_type string, body binary"
)

_EXTS = (".warc", ".warc.gz", ".wet", ".wet.gz")


def _warc_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    if not os.path.isdir(path):
        raise ValueError(f"warc source path does not exist: {path}")
    out = [
        os.path.join(path, n)
        for n in sorted(os.listdir(path))
        if n.endswith(_EXTS)
    ]
    if not out:
        raise ValueError(f"no .warc/.warc.gz files under {path}")
    return out


class WarcFilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class WarcBatchReader(DataSourceReader):
    def __init__(self, options):
        if "path" not in options:
            raise ValueError("warc source requires a path")
        self.files = _warc_files(options["path"])

    def partitions(self):
        return [WarcFilePartition(f) for f in self.files]

    def read(self, partition: WarcFilePartition):
        yield from _read_warc_file(partition.file_path)


def _read_warc_file(file_path: str):
    from streamprocess_spark.functions.warc import np_parse_warc

    with open(file_path, "rb") as f:
        raw = f.read()
    for rec in np_parse_warc(raw):
        yield (
            file_path,
            rec["record_id"],
            rec["warc_type"],
            rec["target_uri"],
            rec["date"],
            rec["content_type"],
            int(rec["content_length"]),
            rec["http_status"],
            rec["http_content_type"],
            bytes(rec["body"]),
        )


class WarcStreamReader(DataSourceStreamReader):
    """Continuous crawl intake (S5-shape): new segment files appearing
    in the directory stream in with whole-file exactly-once semantics —
    a file is either fully in one micro-batch or not started, and the
    engine's offset log replays the same file set after a checkpoint
    restart. Crawl segments are immutable once written (drop files in
    with an atomic rename), so file identity is the offset unit.

    The offset is the sorted list of ingested file names. That is the
    same bookkeeping Spark's own file stream source keeps (its
    seen-files log); at Common Crawl scale (~100k segment names) the
    offset JSON stays in the low MB and lives driver-side only.
    ``max_files_per_batch`` is the maxOffsetsPerTrigger analog: bound
    intake per trigger so executor memory stays flat when a backlog of
    segments lands at once."""

    def __init__(self, options):
        if "path" not in options:
            raise ValueError("warc source requires a path")
        self.path = options["path"]
        cap = int(options.get("max_files_per_batch", 0))
        self.max_per_batch = cap if cap > 0 else None
        # files already planned into a batch; advanced only in
        # partitions() so repeated latestOffset() calls between plans
        # (no-progress triggers) stay idempotent and the per-batch cap
        # holds no matter how often the engine polls
        self._planned: list[str] = []

    def _listing(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            n for n in os.listdir(self.path) if n.endswith(_EXTS)
        )

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        # pure function of (_planned, directory listing) — no state
        # commit here, so N polls before a plan still admit at most
        # max_per_batch files into the next batch
        planned = set(self._planned)
        new = [n for n in self._listing() if n not in planned]
        if self.max_per_batch is not None:
            new = new[: self.max_per_batch]
        return {"files": sorted(planned | set(new))}

    def partitions(self, start: dict, end: dict):
        # re-anchor after checkpoint restart: never re-plan below start
        done = set(start.get("files", []))
        target = set(end.get("files", []))
        self._planned = sorted(set(self._planned) | target | done)
        todo = sorted(target - done)
        return [
            WarcFilePartition(os.path.join(self.path, n)) for n in todo
        ] or [WarcFilePartition("")]

    def read(self, partition: WarcFilePartition):
        if not partition.file_path:
            return
        yield from _read_warc_file(partition.file_path)

    def commit(self, end: dict) -> None:
        # the engine's offset log already persisted `end`; a
        # broker-backed variant would trim/ack segments here
        pass


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return WarcBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return WarcStreamReader(self.options)


def register_warc_source(spark) -> None:
    spark.dataSource.register(WarcDataSource)
