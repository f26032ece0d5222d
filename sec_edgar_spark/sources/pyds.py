"""EDGAR master.idx as a first-class Spark 4 Python DataSource.

``spark.read.format("edgar_index").load(path_or_glob)`` — the pluggable
form of sources/index.read_master_idx (SURVEY §2.1 S1/S2; reference
core/_index.py:117-178 does the same parse as a sequential regex
loop).  The DataSource API (SPARK-44076, Spark 4.0+) runs ``read`` on
EXECUTORS, one task per InputPartition: here one partition per idx
file, so a 30-year × 4-quarter mirror parses 120-way parallel with no
driver involvement beyond the file listing.

Why keep both forms: the CSV-scan pipeline (sources/index.py) stays
the throughput path — it is JVM/codegen end to end; this source is the
*integration* path, where per-file Python logic (auth, retries,
decompression, odd encodings) would otherwise force a driver loop.
Both produce identical rows — tests/test_pyds.py asserts row-for-row
parity on the reference's own fixture files.

Semantics matched to read_master_idx:
- banner/separator rows dropped by the same validity rule
  (numeric CIK, 5 pipe-fields, parseable date);
- quarterly ``yyyy-MM-dd`` and daily ``yyyyMMdd``/``MM-dd-yyyy`` date
  era formats all normalize to DateType (functions/scalars.py C2);
- per-file ``line_no`` over VALID rows in file order (the A3/L1
  order-sensitivity contract).
"""

from __future__ import annotations

import datetime as _dt
import glob as _glob
import os
import re as _re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA = (
    "cik bigint, company_name string, form_type string, "
    "date_filed date, file_name string, source_file string, line_no bigint"
)


_CIK_RE = _re.compile(r"^[0-9]+$")
_DATE_RAW_RE = _re.compile(r"^[0-9-]+$")


_DATE_SHAPES = (
    # (shape regex, strptime format) — the explicit shape check keeps
    # this twin NULL-for-NULL identical to the batch path: strptime
    # alone accepts non-zero-padded tokens like '1-2-1997' that
    # try_to_date('MM-dd-yyyy') rejects, so without it the streaming
    # and batch paths could parse loosely padded idx rows differently.
    (_re.compile(r"^\d{4}-\d{2}-\d{2}$"), "%Y-%m-%d"),
    (_re.compile(r"^\d{8}$"), "%Y%m%d"),
    (_re.compile(r"^\d{2}-\d{2}-\d{4}$"), "%m-%d-%Y"),
)


def _parse_date(tok: str) -> _dt.date | None:
    """Twin of functions/scalars.parse_idx_date: the three idx date
    shapes (quarterly yyyy-MM-dd, daily yyyyMMdd, pre-1998 daily
    MM-dd-yyyy), each gated by an exact zero-padded shape regex (the
    Spark formats are strict); anything else is NULL — the row is
    still kept, exactly like the batch path's try_to_date coalesce."""
    for shape, fmt in _DATE_SHAPES:
        if not shape.match(tok):
            continue
        try:
            return _dt.datetime.strptime(tok, fmt).date()
        except ValueError:
            continue
    return None


def parse_idx_file(path: str):
    """Yield (cik, company, form, date, file, source_file, line_no)
    for every valid row of one master.idx file, in file order.

    Semantics are a STRICT twin of sources/index.read_master_idx (the
    parity contract tests/test_pyds.py enforces):
    - exactly 5 pipe-fields; cik all-digits; date_raw matches
      ``^[0-9-]+$`` (an unparseable-but-well-formed date keeps the row
      with a NULL date, like the batch try_to_date);
    - company/form/file fields must be non-empty (the reference's
      ``.+`` regex groups) and are NOT whitespace-stripped;
    - only the trailing CR/LF strips off the file field;
    - utf-8 with replacement characters, matching the JVM text scan;
    - ``line_no`` is the PHYSICAL 1-based line number (banner
      included), matching sources/_lineno.with_line_numbers.
    """
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        for line_no, raw in enumerate(fh, start=1):
            parts = raw.rstrip("\n").split("|")
            if len(parts) != 5:
                continue
            cik_raw, company, form, date_raw, file_raw = parts
            file_name = file_raw.rstrip("\r\n")
            if (
                not _CIK_RE.match(cik_raw)
                or not _DATE_RAW_RE.match(date_raw)
                or company == ""
                or form == ""
                or file_name == ""
            ):
                continue
            yield (
                int(cik_raw),
                company,
                form,
                _parse_date(date_raw),
                file_name,
                path,
                line_no,
            )


class _IdxPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class EdgarIndexReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("edgar_index requires a path: .load(<file|glob|dir>)")

    def partitions(self):
        p = self._path
        if os.path.isdir(p):
            files = sorted(
                os.path.join(r, f)
                for r, _d, fs in os.walk(p)
                for f in fs
                if f.endswith(".idx")
            )
        else:
            files = sorted(_glob.glob(p))
        if not files:
            raise FileNotFoundError(f"no idx files match {p!r}")
        return [_IdxPartition(f) for f in files]

    def read(self, partition: _IdxPartition):
        yield from parse_idx_file(partition.path)


class EdgarIndexDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "edgar_index"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> EdgarIndexReader:
        return EdgarIndexReader(self.options)


def register(spark) -> None:
    """Idempotently register the format with this session."""
    spark.dataSource.register(EdgarIndexDataSource)


# ---------------------------------------------------------------------------
# Write side: the patterned file-tree sink (S13) as a DataSource writer.
# ---------------------------------------------------------------------------

import dataclasses as _dc

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@_dc.dataclass
class _TreeCommit(WriterCommitMessage):
    files: list


class FilingTreeWriter(DataSourceWriter):
    """Executor-side writer: each task writes its rows' files under
    ``<path>/<cik>/<form_type>/<accession_number>.txt`` (the reference's
    save layout, daily.py:134-166) and reports them in its commit
    message.  ``commit`` runs once on the driver after EVERY task
    succeeded and writes a ``_MANIFEST`` of all files — the all-or-
    nothing marker readers key on; ``abort`` deletes whatever partial
    tasks reported.  This is the same two-phase contract Spark's file
    sinks implement in the JVM, expressed through the Python
    DataSource write API (SPARK-44076)."""

    def __init__(self, options: dict):
        self._root = options.get("path")
        if not self._root:
            raise ValueError("filing_tree requires a path")

    def write(self, rows) -> _TreeCommit:
        import os

        written = []
        for r in rows:
            d = os.path.join(self._root, str(r.cik), str(r.form_type))
            os.makedirs(d, exist_ok=True)
            f = os.path.join(d, f"{r.accession_number}.txt")
            with open(f, "w", encoding="utf-8") as fh:
                fh.write(r.content or "")
            written.append(f)
        return _TreeCommit(files=written)

    def commit(self, messages) -> None:
        import os

        with open(os.path.join(self._root, "_MANIFEST"), "w") as fh:
            for m in messages:
                for f in sorted(m.files):
                    fh.write(f + "\n")

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is None:
                continue
            for f in m.files:
                try:
                    os.remove(f)
                except OSError:
                    pass


class FilingTreeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "filing_tree"

    def writer(self, schema: StructType, overwrite: bool) -> FilingTreeWriter:
        root = self.options.get("path")
        if overwrite and root and os.path.isdir(root):
            # honor mode("overwrite"): clear the existing tree at plan
            # time (non-atomic, like any plain-filesystem overwrite —
            # a failed job leaves the tree empty rather than stale;
            # the _MANIFEST is the completeness marker either way)
            import shutil

            for entry in os.listdir(root):
                p = os.path.join(root, entry)
                if os.path.isdir(p):
                    shutil.rmtree(p)
                else:
                    os.remove(p)
        return FilingTreeWriter(self.options)


def manifest_files(root: str) -> list[str]:
    """The committed files of a filing_tree write — the all-or-nothing
    reader view.  Orphan files from failed/zombie task attempts may
    exist on disk (a task that died after writing but before returning
    its commit message never reaches ``commit``), but they are never
    listed in ``_MANIFEST``; readers that key on this list skip them.
    Raises FileNotFoundError when no commit has completed — a tree
    without a manifest is an uncommitted (failed) write."""
    with open(os.path.join(root, "_MANIFEST")) as fh:
        return [ln for ln in fh.read().splitlines() if ln]


def register_writer(spark) -> None:
    spark.dataSource.register(FilingTreeDataSource)


# ---------------------------------------------------------------------------
# Streaming read side: the daily-index feed as a Python streaming source.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class EdgarIndexStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch source over a growing directory of daily idx files.

    EDGAR's daily feed is date-named (``YYYYMMDD.idx``), so the stream
    offset is simply the lexicographically-largest file name processed:
    ``read(start)`` picks up every file named above it (the new days),
    and ``readBetweenOffsets`` replays exactly the files in
    ``(start, end]`` for recovery — deterministic because names are
    immutable and totally ordered.  This is the streaming twin of the
    batch ``edgar_index`` source (streaming/daily_feed.py holds the
    JVM file-stream form); offsets are tiny JSON dicts regardless of
    history length.
    """

    def __init__(self, options: dict):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("edgar_index_stream requires a path")

    def _files(self):
        if not os.path.isdir(self._dir):
            return []
        return sorted(f for f in os.listdir(self._dir) if f.endswith(".idx"))

    def initialOffset(self) -> dict:
        return {"last": ""}

    def read(self, start: dict):
        new = [f for f in self._files() if f > start.get("last", "")]
        end = {"last": new[-1]} if new else dict(start)
        # a concrete list, not a generator: the runner pickles the
        # prefetched rows alongside the offset
        return self._rows(new), end

    def readBetweenOffsets(self, start: dict, end: dict):
        lo, hi = start.get("last", ""), end.get("last", "")
        return self._rows([f for f in self._files() if lo < f <= hi])

    def _rows(self, names):
        out = []
        for name in names:
            out.extend(parse_idx_file(os.path.join(self._dir, name)))
        # the runner requires a picklable ITERATOR (it caches prefetched
        # rows next to the offset): a list_iterator is both
        return iter(out)


class EdgarIndexStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "edgar_index_stream"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema: StructType) -> EdgarIndexStreamReader:
        return EdgarIndexStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(EdgarIndexStreamDataSource)
