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
from pyspark.sql.types import BinaryType


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
