"""Property test for functions/text.shingles against a pure-Python
reference — randomized token lists INCLUDING the short/empty docs that
used to crash the expression (sequence(1,0) descending into
slice(toks, 0, n) — the r8 decontam_stream bug, fixed at the helper).

One SparkSession evaluation per example would cost minutes; instead a
single batch DataFrame evaluates every hypothesis-style case at once
(the cases are enumerated deterministically — token counts 0..12
around every n in 2..9 — which covers the boundary lattice the bug
lived on better than random draws)."""

from pyspark.sql import functions as F


def _ref_shingles(toks: list[str], n: int) -> list[str]:
    seen, out = set(), []
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def test_shingles_match_reference_on_boundary_lattice(spark):
    from sec_edgar_spark.functions import text as T

    cases = []
    cid = 0
    for n in range(2, 10):
        for size in range(0, 13):
            # repeated tokens exercise array_distinct; varied tokens
            # exercise ordering
            toks = [f"t{i % max(size // 2, 1)}" for i in range(size)]
            cases.append((cid, n, " ".join(toks), _ref_shingles(toks, n)))
            cid += 1
            toks = [f"u{i}" for i in range(size)]
            cases.append((cid, n, " ".join(toks), _ref_shingles(toks, n)))
            cid += 1
    df = spark.createDataFrame(
        [(c, n, t) for c, n, t, _ in cases],
        "cid long, n int, text string",
    )
    # evaluate per distinct n (n is a Python-side literal of the
    # expression)
    got = {}
    for n in sorted({n for _, n, _, _ in cases}):
        rows = (
            df.filter(F.col("n") == n)
            .select("cid", T.shingles("text", n).alias("sh"))
            .collect()
        )
        got.update({r.cid: list(r.sh) for r in rows})
    for c, n, t, want in cases:
        assert got[c] == want, (c, n, t, got[c], want)
