"""Python DataSource (edgar_index): row parity with the CSV-pipeline
scan on the reference's own fixture files; partition-per-file."""

import os

import pytest
from pyspark.sql import functions as F

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _fixture_files():
    out = []
    for root, _dirs, files in os.walk(DATA):
        out.extend(
            os.path.join(root, f) for f in files if f.endswith(".idx")
        )
    return sorted(out)


@pytest.fixture(scope="module")
def registered(spark):
    from sec_edgar_spark.sources.pyds import register

    register(spark)
    return spark


def test_reads_fixture_with_expected_schema(registered):
    files = _fixture_files()
    assert files, "no .idx fixtures found"
    df = registered.read.format("edgar_index").load(files[0])
    assert df.columns == [
        "cik",
        "company_name",
        "form_type",
        "date_filed",
        "file_name",
        "source_file",
        "line_no",
    ]
    rows = df.collect()
    assert rows and all(r.cik > 0 for r in rows)
    assert all(r.date_filed is not None for r in rows)


def test_row_parity_with_csv_pipeline(registered):
    """The pluggable source and the JVM CSV pipeline must produce the
    same logical rows from the same files."""
    from sec_edgar_spark.sources.index import read_master_idx

    files = _fixture_files()
    got = {
        (r.cik, r.company_name, r.form_type, str(r.date_filed), r.file_name, r.line_no)
        for r in registered.read.format("edgar_index").load(
            os.path.join(DATA, "full-index")
        ).collect()
    }
    idx_files = [f for f in files if "full-index" in f]
    want = {
        (r.cik, r.company_name, r.form_type, str(r.date_filed), r.file_name, r.line_no)
        for r in read_master_idx(registered, idx_files)
        .select("cik", "company_name", "form_type", "date_filed", "file_name", "line_no")
        .collect()
    }
    assert got == want


def test_partition_per_file(registered):
    files = _fixture_files()
    df = registered.read.format("edgar_index").load(
        os.path.join(DATA, "full-index")
    )
    n_parts = df.rdd.getNumPartitions()
    n_files = len([f for f in files if "full-index" in f])
    assert n_parts == n_files


def test_missing_path_raises(registered):
    with pytest.raises(Exception):
        registered.read.format("edgar_index").load(
            "/nonexistent/nothing-*.idx"
        ).collect()


def test_filing_tree_writer_two_phase(registered, tmp_path):
    """DataSource write side: files land in the patterned tree and the
    driver-side commit writes a complete _MANIFEST."""
    from sec_edgar_spark.sources.pyds import register_writer

    register_writer(registered)
    root = str(tmp_path / "tree")
    os.makedirs(root, exist_ok=True)
    df = registered.createDataFrame(
        [
            (320193, "10-K", "0000320193-96-000023", "apple body"),
            (789019, "10-Q", "0000789019-96-000040", "msft body"),
        ],
        "cik long, form_type string, accession_number string, content string",
    ).repartition(2)
    df.write.format("filing_tree").mode("append").save(root)

    apple = os.path.join(root, "320193", "10-K", "0000320193-96-000023.txt")
    assert open(apple).read() == "apple body"
    manifest = open(os.path.join(root, "_MANIFEST")).read().splitlines()
    assert len(manifest) == 2 and apple in manifest


def test_filing_tree_task_retry_orphans_excluded(tmp_path):
    """Exactly-once under task retry (VERDICT r5 #6): a task attempt
    that dies AFTER writing files but BEFORE returning its commit
    message leaves orphans on disk; only the successful attempts'
    messages reach commit(), so _MANIFEST — the reader view
    (manifest_files) — lists exactly the committed files and excludes
    every orphan.  Exercises the DataSource two-phase contract at the
    API level (Spark discards a failed attempt's message and re-invokes
    write() on the same rows; commit() sees one message per task)."""
    from pyspark.sql import Row

    from sec_edgar_spark.sources.pyds import (
        FilingTreeWriter,
        manifest_files,
    )

    root = str(tmp_path / "tree")
    os.makedirs(root)
    w = FilingTreeWriter({"path": root})
    t0 = [
        Row(
            cik=1, form_type="10-K", accession_number="acc-1", content="a"
        ),
        Row(
            cik=1, form_type="10-K", accession_number="acc-2", content="b"
        ),
    ]
    t1 = [
        Row(cik=2, form_type="10-Q", accession_number="acc-3", content="c")
    ]

    # uncommitted manifest read = failed write, loudly
    with pytest.raises(FileNotFoundError):
        manifest_files(root)

    # attempt 1 of task 0: writes its first file, then the executor
    # dies mid-iteration — no commit message ever returned
    class _Boom(RuntimeError):
        pass

    def poisoned():
        yield t0[0]
        raise _Boom("injected task failure")

    with pytest.raises(_Boom):
        w.write(poisoned())
    orphan = os.path.join(root, "1", "10-K", "acc-1.txt")
    assert os.path.exists(orphan)  # the orphan is on disk...

    # ...plus a zombie straggler from some long-dead attempt that the
    # retry will NOT rewrite (e.g. the task's row set was re-planned)
    zombie = os.path.join(root, "1", "10-K", "zombie.txt")
    with open(zombie, "w") as fh:
        fh.write("stale")

    # retry of task 0 reprocesses the SAME rows and succeeds; task 1
    # succeeds first try; only these two messages reach commit()
    m0 = w.write(iter(t0))
    m1 = w.write(iter(t1))
    w.commit([m0, m1])

    committed = manifest_files(root)
    assert sorted(committed) == sorted(
        [
            os.path.join(root, "1", "10-K", "acc-1.txt"),
            os.path.join(root, "1", "10-K", "acc-2.txt"),
            os.path.join(root, "2", "10-Q", "acc-3.txt"),
        ]
    )
    # the zombie exists on disk but is invisible to manifest readers
    assert os.path.exists(zombie)
    assert zombie not in committed
    # deterministic paths: the retried file was overwritten in place
    # with the same content, so the orphan IS the committed file
    assert open(orphan).read() == "a"


def test_streaming_source_picks_up_new_days(registered, tmp_path):
    """edgar_index_stream: each new date-named idx file arrives as a
    micro-batch exactly once; the offset is the max processed name."""
    import shutil

    from sec_edgar_spark.sources.pyds import register_stream

    register_stream(registered)
    feed = tmp_path / "daily"
    feed.mkdir()
    src = _fixture_files()[0]
    shutil.copy(src, feed / "20240101.idx")

    q = (
        registered.readStream.format("edgar_index_stream")
        .load(str(feed))
        .writeStream.format("memory")
        .queryName("t_idx_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = registered.sql("SELECT COUNT(*) n FROM t_idx_stream").collect()[0].n
        assert n1 > 0
        shutil.copy(src, feed / "20240102.idx")
        q.processAllAvailable()
        rows = registered.sql(
            "SELECT source_file, COUNT(*) n FROM t_idx_stream GROUP BY 1"
        ).collect()
        assert q.exception() is None
    finally:
        q.stop()
    assert len(rows) == 2  # one batch per file, no re-reads
    assert {r.n for r in rows} == {n1}


def test_filing_tree_overwrite_clears_previous(registered, tmp_path):
    from sec_edgar_spark.sources.pyds import register_writer

    register_writer(registered)
    root = str(tmp_path / "tree2")
    os.makedirs(root, exist_ok=True)
    schema = "cik long, form_type string, accession_number string, content string"
    registered.createDataFrame(
        [(1, "10-K", "a-1", "old")], schema
    ).write.format("filing_tree").mode("append").save(root)
    registered.createDataFrame(
        [(2, "10-Q", "b-1", "new")], schema
    ).write.format("filing_tree").mode("overwrite").save(root)
    # old tree gone, new present, manifest lists only the new file
    assert not os.path.exists(os.path.join(root, "1"))
    new = os.path.join(root, "2", "10-Q", "b-1.txt")
    assert open(new).read() == "new"
    assert open(os.path.join(root, "_MANIFEST")).read().splitlines() == [new]
