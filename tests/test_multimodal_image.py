"""BMP pixel decode + tile-luminance kernel: layout traps and the
fusion/kernel invariants not covered by the value-gated oracle."""

import numpy as np
import pytest

from sec_edgar_spark.operators.multimodal import bmp_pixels


def _bmp(width, height, pixels_rgb, bottom_up=True):
    """Build a 24-bit BI_RGB BMP from a top-down H×W×3 RGB array."""
    stride = ((3 * width + 3) // 4) * 4
    rows = []
    order = range(height - 1, -1, -1) if bottom_up else range(height)
    for y in order:
        row = bytearray()
        for x in range(width):
            r, g, b = pixels_rgb[y][x]
            row += bytes([b, g, r])  # file stores BGR
        row += b"\x00" * (stride - 3 * width)
        rows.append(bytes(row))
    data = b"".join(rows)
    h_field = height if bottom_up else -height
    header = (
        b"BM"
        + (54 + len(data)).to_bytes(4, "little")
        + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little")
        + h_field.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


def test_bmp_roundtrip_bottom_up_and_padding():
    # 3×2: width 3 → 9 data bytes/row → 3 pad bytes (the 4-byte trap)
    px = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    got = bmp_pixels(_bmp(3, 2, px))
    assert got.shape == (2, 3, 3)
    assert got.tolist() == [[list(p) for p in row] for row in px]


def test_bmp_top_down_negative_height():
    px = [[(1, 2, 3)], [(4, 5, 6)]]
    got = bmp_pixels(_bmp(1, 2, px, bottom_up=False))
    assert got.tolist() == [[list(p) for p in row] for row in px]


@pytest.mark.parametrize(
    "blob",
    [
        None,
        b"",
        b"XX" + b"\x00" * 60,          # wrong magic
        b"BM" + b"\x00" * 20,          # truncated header
        _bmp(2, 2, [[(0, 0, 0)] * 2] * 2)[:-3],  # truncated pixel data
    ],
)
def test_bmp_malformed_returns_none(blob):
    assert bmp_pixels(blob) is None


def test_bmp_8bpp_rejected():
    blob = bytearray(_bmp(2, 2, [[(0, 0, 0)] * 2] * 2))
    blob[28:30] = (8).to_bytes(2, "little")
    assert bmp_pixels(bytes(blob)) is None


def test_tile_luminance_kernel_geometry(spark):
    """9×9 image, 8×8 tiles → 2×2 tile grid; tile sums must match a
    direct numpy computation including zero-padded edge tiles."""
    from sec_edgar_spark.operators.multimodal import image_tile_luminance

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(9, 9, 3)).astype(int)
    blob = _bmp(9, 9, px.tolist())
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id LONG, blob BINARY")
    row = image_tile_luminance(df, "blob", tile=8).collect()[0]
    lum = 2126 * px[:, :, 0] + 7152 * px[:, :, 1] + 722 * px[:, :, 2]
    padded = np.zeros((16, 16), dtype=np.int64)
    padded[:9, :9] = lum
    per = padded.reshape(2, 8, 2, 8).sum(axis=(1, 3)).reshape(-1)
    assert row.n_tiles == 4
    assert row.total_lum == int(lum.sum())
    assert row.peak_tile == int(per.argmax())
    assert row.peak_lum == int(per.max())


def test_hybrid_rrf_fusion_invariants(spark):
    """Fused top-10 ⊆ union of the arms; a doc ranked 1 by BOTH arms
    must outrank a doc present in only one arm."""
    import sec_edgar_spark.queries as Q

    sf = "/root/testdata/sf0.001"
    rows = Q.queries()["retrieval_hybrid_rrf"](spark, sf).collect()
    assert len(rows) == 10
    assert all(r.bm25_rk > 0 or r.cos_rk > 0 for r in rows)
    # scores non-increasing in rank
    scores = [r.rrf_ppm for r in sorted(rows, key=lambda r: r.rk)]
    assert scores == sorted(scores, reverse=True)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=30),
        bottom_up=st.booleans(),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_bmp_roundtrip_property(w, h, bottom_up, seed):
        """Property: ANY (w, h, row order, pixel content) survives the
        synth → decode roundtrip exactly — padding widths 0..3, 1-px
        edge cases, both row orders."""
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 256, size=(h, w, 3)).astype(int).tolist()
        got = bmp_pixels(_bmp(w, h, px, bottom_up=bottom_up))
        assert got is not None and got.shape == (h, w, 3)
        assert got.tolist() == px

except ImportError:  # pragma: no cover — hypothesis is baked in
    pass
