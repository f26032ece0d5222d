"""Property-based tests (hypothesis) for the pure-Python parse layer —
roundtrip invariants on randomized inputs, no SparkSession needed."""

import binascii
import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from sec_edgar_spark.parsing import meta, uu
from sec_edgar_spark.sources.index import daily_idx_path

ident = st.text(
    alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-", min_size=1, max_size=20
)
body_text = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs"), max_codepoint=0x7E
    ),
    min_size=0,
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(
    accession=st.from_regex(r"[0-9]{10}-[0-9]{2}-[0-9]{6}", fullmatch=True),
    form=st.sampled_from(["10-K", "10-Q", "4", "SC 13D/A"]),
    docs=st.lists(
        st.tuples(ident, st.integers(1, 99), ident, body_text), min_size=1, max_size=5
    ),
)
def test_sgml_roundtrip_random(accession, form, docs):
    parts = [
        "<SEC-DOCUMENT>x.txt : 20240101\n<SEC-HEADER>x.hdr : 20240101\n",
        f"ACCESSION NUMBER:\t{accession}\n",
        f"CONFORMED SUBMISSION TYPE:\t{form}\n",
        "FILER:\n\tCOMPANY DATA:\n\t\tCENTRAL INDEX KEY:\t123\n",
        "</SEC-HEADER>\n",
    ]
    for dtype, seq, fname, text in docs:
        parts.append(
            f"<DOCUMENT>\n<TYPE>{dtype}\n<SEQUENCE>{seq}\n<FILENAME>{fname}\n"
            f"<TEXT>\n{text}\n</TEXT>\n</DOCUMENT>\n"
        )
    parts.append("</SEC-DOCUMENT>\n")
    parsed = meta.parse_filing("".join(parts))
    assert parsed["accession_number"] == accession
    assert parsed["metadata"]["CONFORMED SUBMISSION TYPE"] == form
    assert parsed["metadata"]["FILER/COMPANY DATA/CENTRAL INDEX KEY"] == "123"
    assert len(parsed["documents"]) == len(docs)
    for got, (dtype, seq, fname, text) in zip(parsed["documents"], docs):
        assert got["type"] == dtype.strip()
        assert got["sequence"] == str(seq)
        # TEXT body round-trips modulo the newline trim the writer added
        assert got["text"] == text.strip("\n")


@settings(max_examples=200, deadline=None)
@given(payload=st.binary(min_size=0, max_size=500))
def test_uudecode_roundtrip_random(payload):
    lines = [
        binascii.b2a_uu(payload[i : i + 45]).decode().rstrip("\n")
        for i in range(0, len(payload), 45)
    ] or [binascii.b2a_uu(b"").decode().rstrip("\n")]
    block = "begin 644 f.bin\n" + "\n".join(lines) + "\n`\nend"
    assert uu.uudecode_text(block) == payload


@settings(max_examples=300, deadline=None)
@given(
    d=st.dates(
        min_value=datetime.date(1993, 1, 1), max_value=datetime.date(2030, 12, 31)
    )
)
def test_daily_idx_path_eras(d):
    path = daily_idx_path("m", d)
    assert f"/QTR{(d.month - 1) // 3 + 1}/" in path
    token = path.rsplit("master.", 1)[1].removesuffix(".idx")
    if d.year < 1995:
        assert token == d.strftime("%m%d%y")
    elif (d.year, d.month, d.day) < (1998, 3, 31):
        assert token == d.strftime("%y%m%d")
    else:
        assert token == d.strftime("%Y%m%d")


@given(
    w=st.integers(min_value=1, max_value=65535),
    h=st.integers(min_value=1, max_value=65535),
)
@settings(max_examples=100, deadline=None)
def test_media_header_roundtrip(w, h):
    """Construct→parse roundtrip for every header parser."""
    from sec_edgar_spark.operators.multimodal import (
        gif_dimensions,
        jpeg_dimensions,
        png_dimensions,
    )

    png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
    )
    assert png_dimensions(png) == (w, h)

    gif = b"GIF87a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    assert gif_dimensions(gif) == (w, h)

    jpeg = (
        b"\xff\xd8" + b"\xff\xe1\x00\x04\x00\x00"
        + b"\xff\xc0\x00\x11\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    )
    assert jpeg_dimensions(jpeg) == (w, h)


@given(
    channels=st.integers(min_value=1, max_value=8),
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    n_samples=st.integers(min_value=0, max_value=10**6),
    bits=st.sampled_from([8, 16, 24, 32]),
)
@settings(max_examples=100, deadline=None)
def test_wav_meta_roundtrip(channels, rate, n_samples, bits):
    from sec_edgar_spark.operators.multimodal import wav_meta

    def le(v, n):
        return int(v).to_bytes(n, "little")

    block = channels * bits // 8
    fmt = (
        b"fmt " + le(16, 4) + le(1, 2) + le(channels, 2) + le(rate, 4)
        + le(rate * block, 4) + le(block, 2) + le(bits, 2)
    )
    data = b"data" + le(n_samples * block, 4)
    wav = b"RIFF" + le(4 + len(fmt) + len(data), 4) + b"WAVE" + fmt + data
    assert wav_meta(wav) == (channels, rate, n_samples)


@given(data=st.binary(min_size=0, max_size=500))
@settings(max_examples=200, deadline=None)
def test_uu_encode_decode_roundtrip(data):
    from sec_edgar_spark.parsing.uu import uudecode_text, uuencode_bytes

    assert uudecode_text(uuencode_bytes(data, "f.bin")) == data


@settings(max_examples=300, deadline=None)
@given(
    x=st.integers(0, (1 << 16) - 1),
    y=st.integers(0, (1 << 16) - 1),
)
def test_morton_roundtrip_bijection(x, y):
    """encode→decode is the identity on the full 16-bit grid, and the
    key stays within 2*bits bits (operators/zorder.py)."""
    from sec_edgar_spark.operators.zorder import (
        morton_decode_py,
        morton_encode_py,
    )

    z = morton_encode_py(x, y, 16)
    assert 0 <= z < (1 << 32)
    assert morton_decode_py(z, 16) == (x, y)
