"""uudecode (SURVEY §2.8 C19).

The reference shells the stdlib ``uu`` module per file
(parser.py:117-125); ``uu`` was removed in Python 3.13, so decoding is
implemented over ``binascii.a2b_uu`` line-by-line.  Exposed as a Python
UDF (binary out) — inherently a Python-side op, applied only to the
(rare) uuencoded documents after the is_uuencoded filter.
"""

from __future__ import annotations

import binascii

from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType


def uudecode_text(text: str) -> bytes | None:
    """Decode a ``begin 644 name`` … ``end`` uuencoded block."""
    if text is None:
        return None
    out = bytearray()
    in_body = False
    for line in text.splitlines():
        if line.startswith("begin "):
            in_body = True
            continue
        if not in_body:
            continue
        if line.strip() in ("end", "`", ""):
            if line.strip() == "end":
                break
            continue
        try:
            out.extend(binascii.a2b_uu(line))
        except binascii.Error:
            # tolerate trailing-space corruption like the classic decoders
            nbytes = (((ord(line[0]) - 32) & 63) * 4 + 5) // 3
            out.extend(binascii.a2b_uu(line[: nbytes + 1]))
    return bytes(out)


uudecode_udf = F.udf(uudecode_text, BinaryType())


def uuencode_bytes(data: bytes, name: str = "file") -> str | None:
    """Encode bytes as a ``begin 644 name`` … ``end`` block
    (b2a_uu 45-byte lines) — the inverse of ``uudecode_text``, used by
    the roundtrip gate query and for writing reference-style uu blocks.
    """
    if data is None:
        return None
    lines = [f"begin 644 {name}"]
    for i in range(0, len(data), 45):
        lines.append(binascii.b2a_uu(data[i : i + 45]).decode("ascii").rstrip("\n"))
    lines.append("`")
    lines.append("end")
    return "\n".join(lines)


# Wrapped in a plain lambda (F.udf can't infer an eval type from the
# `bytes | None` hint + default-arg signature); returnType as a
# DataType object so the UDF constructs without an active session.
uuencode_udf = F.udf(lambda data, name: uuencode_bytes(data, name), StringType())
