"""Custom Python DataSource: a paginated document feed.

The reference ingests documents through a REST endpoint
(``app/api/endpoints/documents.py:16-38`` — ``POST /libraries/{id}/
documents``), pulling batches into memory one request at a time.  The
Spark-native equivalent of "consume a paginated HTTP feed" is a custom
`pyspark.sql.datasource.DataSource` (the PySpark 4 Python data-source
API): the feed is split into PAGES, each page becomes an
``InputPartition``, and EXECUTORS fetch pages in parallel — ingest
bandwidth scales with the cluster instead of a single driver-side
request loop.

The sandbox has no network, so the "feed" is a JSONL file standing in
for the HTTP endpoint (one JSON object per line == one record from the
API, the standard REST-export shape).  Swapping the file read inside
``FeedReader.read`` for an HTTP page fetch changes nothing about the
plan: partition planning, serialization, and parallelism are identical
— that seam is the point of the data-source API.

Scale posture: ``partitions()`` plans one partition per page from byte
offsets ONLY (the driver never reads the feed body — it stats the file
and slices [0, size) into page ranges); each executor task reads and
parses just its own byte slice, aligning to line boundaries the same
way Spark's own text sources do (skip the partial first line, read one
line past the end).  Driver memory is O(pages), data transfer is
executor-side only.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

FEED_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


class _FeedPage(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class FeedReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("document_feed: 'path' option is required")
        self.page_bytes = max(1, int(options.get("page_bytes", 1 << 20)))
        # "fail" (default): a malformed record fails the task — the
        # correctness posture.  "skip": drop malformed lines — the
        # real-feed ingest posture (a poisoned record must not wedge a
        # 100 TB backfill; the skipped count is recoverable by diffing
        # row counts against the feed's line count).
        self.mode = options.get("mode", "fail")
        if self.mode not in ("fail", "skip"):
            raise ValueError("document_feed: mode must be 'fail' or 'skip'")
        self._eq_filters: list[tuple[str, object]] = []

    def pushFilters(self, filters):
        """Accept equality predicates on the low-cardinality metadata
        columns; everything else stays with Spark.  A pushed filter is
        applied DURING parse, before rows enter Arrow serialization —
        for a selective predicate the executor→JVM transfer shrinks by
        the filter's selectivity (the Python-source analog of parquet
        PushedFilters).  ALL accepted filters are kept and ANDed — two
        contradictory equalities on the same column (Catalyst does not
        fold them to false) correctly yield zero rows."""
        from pyspark.sql.datasource import EqualTo

        for f in filters:
            if (
                isinstance(f, EqualTo)
                and len(f.attribute) == 1
                and f.attribute[0] in ("lang", "source")
            ):
                self._eq_filters.append((f.attribute[0], f.value))
            else:
                yield f  # unsupported: Spark keeps evaluating it

    def partitions(self):
        size = os.path.getsize(self.path)
        pages = []
        start = 0
        while start < size:
            end = min(start + self.page_bytes, size)
            pages.append(_FeedPage(self.path, start, end))
            start = end
        return pages or [_FeedPage(self.path, 0, 0)]

    # rows per emitted Arrow batch: bounds page-reader memory while
    # keeping batches big enough for the columnar transfer to pay off
    _ARROW_BATCH_ROWS = 10_000

    def read(self, partition: _FeedPage):
        # byte-sliced line reads, Hadoop-text-source style: a record
        # belongs to the page containing its FIRST byte; a record that
        # straddles the page end is read to completion by its owner and
        # skipped by the next page.  The seek(start-1)+readline trick
        # keeps a line that begins exactly at the boundary (seeking to
        # start and unconditionally skipping would drop it).
        #
        # Output is Arrow RecordBatches (r14, guide §4): a Python data
        # source that yields tuples pays a per-row pickle on the
        # worker→JVM hop; yielding the page as columnar batches moves
        # the same rows in a handful of Arrow buffers.  Parse order,
        # boundary semantics, pushed-filter and mode behavior are
        # unchanged — only the serialization container differs.
        import pyarrow as pa

        cols = ([], [], [], [], [])

        def flush():
            batch = pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[0], type=pa.int64()),
                    pa.array(cols[1], type=pa.string()),
                    pa.array(cols[2], type=pa.string()),
                    pa.array(cols[3], type=pa.string()),
                    pa.array(cols[4], type=pa.int64()),
                ],
                names=["doc_id", "text", "lang", "source", "n_chars"],
            )
            for c in cols:
                c.clear()
            return batch

        with open(partition.path, "rb") as fh:
            if partition.start > 0:
                fh.seek(partition.start - 1)
                fh.readline()  # partial (or boundary '\n') of prior page
            while True:
                pos = fh.tell()
                if pos >= partition.end:
                    break
                line = fh.readline()
                if not line:
                    break
                if not line.strip():
                    continue
                try:
                    rec = json.loads(line)
                except ValueError:
                    if self.mode == "skip":
                        continue
                    raise
                # pushed filters run BEFORE row construction: a record
                # the predicate excludes must not fail the read just
                # because it is missing other schema fields
                if any(
                    rec.get(col) != want for col, want in self._eq_filters
                ):
                    continue
                try:
                    row = _record_tuple(rec)
                except (KeyError, TypeError):
                    if self.mode == "skip":
                        continue
                    raise
                for c, v in zip(cols, row):
                    c.append(v)
                if len(cols[0]) >= self._ARROW_BATCH_ROWS:
                    yield flush()
        if cols[0]:
            yield flush()


def _record_tuple(rec: dict):
    """One FEED_SCHEMA row from a parsed feed record — the single place
    batch and streaming reads build rows, so they cannot diverge."""
    return (
        rec["doc_id"],
        rec["text"],
        rec.get("lang"),
        rec.get("source"),
        rec["n_chars"],
    )


def _parse_line(line: bytes):
    return _record_tuple(json.loads(line))


class FeedStreamReader(SimpleDataSourceStreamReader):
    """Tail the feed as a STREAMING source: the offset is a byte
    position into the append-only feed file — the reference's
    background-ingest loop (`app/api/services/background_tasks.py:4-18`
    polling for new work) as a checkpointable Structured Streaming
    source.  Each micro-batch reads [last_pos, EOF) complete lines and
    advances the offset; a restart resumes from the check-pointed byte
    position, and ``readBetweenOffsets`` replays any committed range
    exactly (offsets are byte positions, so replay is a seek + bounded
    read — deterministic recovery for free)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("document_feed: 'path' option is required")
        # same contract as the batch reader: "skip" drops malformed
        # lines instead of failing the micro-batch — without it a
        # poisoned record wedges the stream forever (every retry
        # re-reads the same line before the offset can advance)
        self.mode = options.get("mode", "fail")
        if self.mode not in ("fail", "skip"):
            raise ValueError("document_feed: mode must be 'fail' or 'skip'")

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _read_range(self, start: int, end: int | None):
        rows = []
        with open(self.path, "rb") as fh:
            fh.seek(start)
            pos = start
            while end is None or pos < end:
                line = fh.readline()
                if not line or not line.endswith(b"\n"):
                    break  # EOF or partial trailing line: next batch's work
                pos = fh.tell()
                if not line.strip():
                    continue
                try:
                    rows.append(_parse_line(line))
                except (ValueError, KeyError, TypeError):
                    if self.mode == "skip":
                        continue
                    raise
        return rows, pos

    def read(self, start: dict):
        rows, pos = self._read_range(int(start["pos"]), None)
        return iter(rows), {"pos": pos}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows, _ = self._read_range(int(start["pos"]), int(end["pos"]))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; nothing external to ack


class DocumentFeedDataSource(DataSource):
    """``spark.read.format("document_feed").option("path", ...)`` for
    batch; ``spark.readStream.format("document_feed")`` to tail."""

    @classmethod
    def name(cls) -> str:
        return "document_feed"

    def schema(self) -> str:
        return FEED_SCHEMA

    def reader(self, schema) -> FeedReader:
        return FeedReader(self.options)

    def simpleStreamReader(self, schema) -> FeedStreamReader:
        return FeedStreamReader(self.options)


def register_feed_source(spark) -> None:
    """Idempotent registration (re-registering is a no-op overwrite).

    Python-source filter pushdown is gated by a conf that defaults off;
    a reader implementing ``pushFilters`` FAILS to initialize under the
    default, so registration enables it (runtime-settable)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DocumentFeedDataSource)
