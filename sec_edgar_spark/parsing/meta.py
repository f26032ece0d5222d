"""SGML filing-container parser (SURVEY §2.1 S15, §2.8 C14-C15, §2.10).

The reference's ``MetaParser.process`` (parser.py:44-138) walks one
``.txt`` SGML container at a time in pure Python: extract the
``<SEC-HEADER>`` key/values (flat ``KEY: VALUE`` lines plus two-level
tab-indented sections, parser.py:140-213), split ``<DOCUMENT>``
sections, read each document's ``<TYPE>/<SEQUENCE>/<FILENAME>`` first
lines (parser.py:215-242), and uudecode binaries (parser.py:117-125).

Spark-first shape: filings arrive as a (path, content) DataFrame from a
``binaryFile`` scan (one row per filing — the reference's directory walk
``extract_meta``, _base.py:15-27, becomes a glob load); parsing runs as
``mapInPandas`` — Arrow-batched, one Python crossing per batch, never
per row/regex.  Output rows use the FILING_DOCUMENT schema; ``explode``
yields the per-document table.  Filing sizes are KB→100 MB (skew risk,
SURVEY §7 risk 3): repartition by size bucket upstream when mirroring.

The parse function itself is plain Python over one string — unit-tested
directly against golden fixtures without a SparkSession.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import FILING_DOCUMENT

_DOC_RE = re.compile(r"<DOCUMENT>(.*?)</DOCUMENT>", re.S)
_TEXT_RE = re.compile(r"<TEXT>(.*?)</TEXT>", re.S)
_TAG_FIRSTLINE_RES = {
    "type": re.compile(r"<TYPE>([^<\n]*)"),
    "sequence": re.compile(r"<SEQUENCE>([^<\n]*)"),
    "filename": re.compile(r"<FILENAME>([^<\n]*)"),
    "description": re.compile(r"<DESCRIPTION>([^<\n]*)"),
}
_HEADER_RE = re.compile(r"<SEC-HEADER>(.*?)</SEC-HEADER>", re.S)
_ACCESSION_RE = re.compile(r"ACCESSION NUMBER:\s*([0-9-]+)")
_ANGLE_KV_RE = re.compile(r"^<([A-Z0-9-]+)>(.*)$")


def parse_header(header_text: str) -> dict[str, str]:
    """SEC-HEADER block → flat map.

    Flat ``KEY:<tabs>VALUE`` lines map directly; section headers (lines
    ending in ``:`` with no value) open a context and indented children
    are stored as ``SECTION/CHILD SECTION/KEY`` paths, preserving the
    reference's two-level nesting (parser.py:140-213) in MapType form.
    ``<ANGLE-TAG>value`` lines (e.g. ACCEPTANCE-DATETIME) also map.
    """
    meta: dict[str, str] = {}
    stack: list[tuple[int, str]] = []  # (indent, section-name)
    for line in header_text.splitlines():
        if not line.strip():
            continue
        m = _ANGLE_KV_RE.match(line.strip())
        if m:
            if m.group(2).strip():
                meta[m.group(1)] = m.group(2).strip()
            continue
        indent = len(line) - len(line.lstrip("\t"))
        stripped = line.strip()
        if ":" not in stripped:
            continue
        key, _, value = stripped.partition(":")
        key, value = key.strip(), value.strip()
        while stack and stack[-1][0] >= indent:
            stack.pop()
        if value:
            prefix = "/".join(s for _, s in stack)
            meta[f"{prefix}/{key}" if prefix else key] = value
        else:
            stack.append((indent, key))
    return meta


def parse_filing(content: str) -> dict:
    """One SGML container → {accession_number, metadata, documents}.

    A NULL/absent container parses to the empty filing (no accession,
    no documents) instead of raising — one bad row must not kill a
    whole-corpus parse (poison sweep, POISON.md)."""
    if content is None:
        return {"accession_number": None, "metadata": {}, "documents": []}
    header_m = _HEADER_RE.search(content)
    header_text = header_m.group(1) if header_m else ""
    metadata = parse_header(header_text)
    acc_m = _ACCESSION_RE.search(header_text or content)
    accession = acc_m.group(1) if acc_m else None

    documents = []
    for doc_m in _DOC_RE.finditer(content):
        doc = doc_m.group(1)
        fields = {
            name: (rx.search(doc).group(1).strip() if rx.search(doc) else None)
            for name, rx in _TAG_FIRSTLINE_RES.items()
        }
        text_m = _TEXT_RE.search(doc)
        text = text_m.group(1).strip("\n") if text_m else ""
        documents.append(
            {
                "type": fields["type"],
                "sequence": fields["sequence"],
                "filename": fields["filename"],
                "text": text,
                # Containment, not prefix: the reference checks
                # ``doc_txt.find("begin 644 ") != -1`` (parser.py:117),
                # so a uu block preceded by other lines still routes
                # to uudecode.
                "is_uuencoded": "begin 644 " in text,
            }
        )
    return {
        "accession_number": accession,
        "metadata": metadata,
        "documents": documents,
    }


def read_filings(spark: SparkSession, path_glob: str) -> DataFrame:
    """binaryFile scan of filing ``.txt`` containers → (path, content)."""
    return (
        spark.read.format("binaryFile").load(path_glob)
        .select(
            F.col("path"),
            F.col("content").cast("string").alias("content"),
        )
    )


def parse_filings(filings: DataFrame) -> DataFrame:
    """(…, content) → FILING_DOCUMENT rows via Arrow-batched mapInPandas."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = [parse_filing(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "accession_number": [o["accession_number"] for o in out],
                    "metadata": [o["metadata"] for o in out],
                    "documents": [
                        [
                            (
                                d["type"],
                                d["sequence"],
                                d["filename"],
                                d["text"],
                                d["is_uuencoded"],
                            )
                            for d in o["documents"]
                        ]
                        for o in out
                    ],
                }
            )

    return filings.mapInPandas(run, schema=FILING_DOCUMENT)


def documents_table(parsed: DataFrame) -> DataFrame:
    """Explode parsed filings to one row per embedded document."""
    return parsed.select(
        "accession_number",
        F.posexplode("documents").alias("seq_doc", "doc"),
    ).select(
        "accession_number",
        "seq_doc",
        F.col("doc.type").alias("type"),
        F.col("doc.sequence").alias("sequence"),
        F.col("doc.filename").alias("filename"),
        F.col("doc.text").alias("text"),
        F.col("doc.is_uuencoded").alias("is_uuencoded"),
    )
