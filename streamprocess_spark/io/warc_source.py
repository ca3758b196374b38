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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
        from streamprocess_spark.functions.warc import np_parse_warc

        with open(partition.file_path, "rb") as f:
            raw = f.read()
        for rec in np_parse_warc(raw):
            yield (
                partition.file_path,
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


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return WarcBatchReader(self.options)


def register_warc_source(spark) -> None:
    spark.dataSource.register(WarcDataSource)
