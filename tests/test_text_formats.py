"""Robust CSV/JSON ingest: the quarantine contract.

good rows parse typed, bad rows land exactly once in _corrupt_record
with their raw text, and good + bad == input lines (data conservation
— the property DROPMALFORMED silently violates)."""

import json


def test_csv_quarantine_conserves_rows(spark, tmp_path):
    from sec_edgar_spark.sources.text_formats import (
        read_csv_robust,
        split_quarantine,
    )

    lines = [
        "id,qty,name",
        "1,10,alpha",
        "2,twenty,beta",  # qty not an int -> corrupt
        "3,30,gamma",
        "4,forty,delta",  # corrupt
    ]
    p = tmp_path / "in.csv"
    p.write_text("\n".join(lines) + "\n")
    df = read_csv_robust(
        spark, str(p), "id INT, qty INT, name STRING"
    )
    good, bad = split_quarantine(df)
    g = {(r.id, r.qty, r.name) for r in good.collect()}
    assert g == {(1, 10, "alpha"), (3, 30, "gamma")}
    b = sorted(r[0] for r in bad.collect())
    assert b == ["2,twenty,beta", "4,forty,delta"]
    assert good.count() + bad.count() == len(lines) - 1  # minus header


def test_json_quarantine_conserves_rows(spark, tmp_path):
    from sec_edgar_spark.sources.text_formats import (
        read_json_robust,
        split_quarantine,
    )

    rows = [
        json.dumps({"id": 1, "v": 1.5}),
        '{"id": 2, "v": ',  # truncated JSON -> corrupt
        json.dumps({"id": 3, "v": 3.5}),
        "not json at all",  # corrupt
    ]
    p = tmp_path / "in.jsonl"
    p.write_text("\n".join(rows) + "\n")
    df = read_json_robust(spark, str(p), "id BIGINT, v DOUBLE")
    good, bad = split_quarantine(df)
    assert {(r.id, r.v) for r in good.collect()} == {(1, 1.5), (3, 3.5)}
    assert bad.count() == 2
    assert good.count() + bad.count() == len(rows)


def test_failfast_raises_on_bad_row(spark, tmp_path):
    """FAILFAST is the manifest-ingest policy: a bad row must raise,
    not quarantine."""
    import pytest
    from py4j.protocol import Py4JJavaError

    p = tmp_path / "in.csv"
    p.write_text("id,qty\n1,10\n2,bad\n")
    df = (
        spark.read.schema("id INT, qty INT")
        .option("header", "true")
        .option("mode", "FAILFAST")
        .csv(str(p))
    )
    with pytest.raises(Py4JJavaError) as exc:
        df.collect()
    # Must be the FAILFAST malformed-record error specifically, not an
    # unrelated failure (path typo, schema mistake) sneaking through.
    msg = str(exc.value)
    assert "FAILFAST" in msg or "Malformed" in msg, msg
