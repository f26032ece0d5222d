"""Build the POISON replica of sf0.001 — hostile-input correctness.

The gate corpora are benign: every doc has text, every embedding has a
norm, every event value is a modest positive double.  Real 100 TB
intake is not — empty and megabyte documents, zero/NaN embeddings,
null fields, -0.0, tied similarity scores, LIKE/regex metacharacters
in source names.  This script writes a DETERMINISTIC adversarial
replica (`/root/repo/testdata_sf0.001_poison/`): each table = the
sf0.001 rows + appended poison rows (ids from 100000 so joins to the
benign rows stay untouched).  The relational TPC-H tables are copied
byte-identical — the poison targets the documents/embeddings/events
surface where the LLM-pipeline operators live.

The poison stays INSIDE documented operator contracts (unique ids,
non-null timestamps, 64-dim embeddings) so every oracle mismatch it
produces is a real finding, not a violated precondition.  Two known
out-of-contract hazards are stated per row below where they are the
point (zero-norm cosine, NaN arithmetic).

Run `python tools/check_oracle.py /root/repo/testdata_sf0.001_poison`
for the full-registry sweep; POISON.md records the triage.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.001"
DST = "/root/repo/testdata_sf0.001_poison"

COPY_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem",
]

# --- documents ---------------------------------------------------------
_HUGE = ("spark shuffle " * 4000).strip()          # 56k chars, 8k tokens
_DUPTOK = ("dup " * 600).strip()                   # degenerate vocabulary
_UNICODE = (
    "emoji \U0001f600\U0001f680 CJK 数据处理 RTL "
    "مرحبا combining é zero‍width "
    "ßharp"
)
_META = "quote\" back\\slash new\nline tab\tpct% under_score .*[](){}|^$"

DOC_ROWS = [
    # (doc_id, text, lang, source, n_chars)
    (100000, "", "en", "poison", 0),                       # empty text
    (100001, "   \n\t  ", "en", "poison", 7),              # whitespace only
    (100002, "x", "en", "poison", 1),                      # single char
    (100003, _HUGE, "en", "poison_huge", len(_HUGE)),      # giant doc
    (100004, _DUPTOK, "en", "poison", len(_DUPTOK)),       # one token forever
    (100005, _UNICODE, "zh", "poison", len(_UNICODE)),     # unicode stress
    (100006, _META, "en", "poison", len(_META)),           # SQL/regex metachars
    (100007, None, "en", "poison_null", 0),                # NULL text
    (100008, "plain poison doc", None, None, 16),          # NULL lang+source
    (100009, "plain poison doc", "xx", "src with space%_", 16),
]

# --- embeddings (dim 64, float32) --------------------------------------
def _vec(fill):
    return [float(fill)] * 64


EMB_ROWS = [
    # (vec_id, embedding, label)
    (100000, _vec(0.0), 0),            # zero norm: cosine 0/0
    (100001, _vec(1e-30), 1),          # denormal after float32 cast
    (100002, _vec(1e30), 2),           # dot overflows float32 -> inf
    (100003, None, 3),                 # NULL vector
    (100004, _vec(1.0), None),         # NULL label
    (100005, "NULL_ELEMENTS", 5),      # 64 NULL elements (filled below)
    # 100006 = exact duplicate of benign vec_id 7 (added in build())
    # 100007 = true NaN elements (inserted via SQL cast in build())
]

# --- events -------------------------------------------------------------
import datetime

_T0 = datetime.datetime(2024, 1, 15, 12, 0, 0)

EVT_ROWS = (
    # lone user
    [(100000, datetime.datetime(2024, 1, 10, 3, 0, 0), 900001, "view",
      1.0, '{"k": 1}')]
    # 50-event same-timestamp burst for one user (tie-break stress;
    # event_id keeps the order key unique, per the documented contract)
    + [(100001 + i, _T0, 900002, "click", float(i), '{"k": 2}')
       for i in range(50)]
    # value edge cases: -0.0 vs 0.0 (distinct IEEE bit patterns, equal
    # by ==), negative, huge-but-summable, NULL value, NULL/empty type
    + [
        (100051, datetime.datetime(2024, 1, 16, 0, 0, 0), 900003,
         "purchase", 0.0, "{}"),
        (100052, datetime.datetime(2024, 1, 16, 0, 0, 1), 900003,
         "purchase", -0.0, "{}"),
        (100053, datetime.datetime(2024, 1, 16, 0, 0, 2), 900003,
         "purchase", -1234.5, "{}"),
        (100054, datetime.datetime(2024, 1, 16, 0, 0, 3), 900003,
         "purchase", 1e12, "{}"),
        (100055, datetime.datetime(2024, 1, 16, 0, 0, 4), 900003,
         "purchase", None, "{}"),
        (100056, datetime.datetime(2024, 1, 16, 0, 0, 5), 900003,
         None, 1.0, "{}"),
        (100057, datetime.datetime(2024, 1, 16, 0, 0, 6), 900003,
         "", 1.0, "{}"),
        # timestamp extremes (inside pandas datetime64[ns] range so the
        # comparator itself stays valid)
        (100058, datetime.datetime(1970, 1, 1, 0, 0, 0), 900004,
         "view", 1.0, "{}"),
        (100059, datetime.datetime(2100, 1, 1, 0, 0, 0), 900004,
         "view", 1.0, "{}"),
        # hostile props JSON
        (100060, datetime.datetime(2024, 1, 17, 0, 0, 0), 900005,
         "view", 1.0, "{not json"),
        (100061, datetime.datetime(2024, 1, 17, 0, 0, 1), 900005,
         "view", 1.0, None),
        (100062, datetime.datetime(2024, 1, 17, 0, 0, 2), 900005,
         "view", 1.0, '{"a": {"b": {"c": [1, 2, {"d": "e"}]}}}'),
        # PARTIALLY-valid JSON (ADVICE r11): Spark's get_json_object /
        # try_parse_json parse the first document and ignore trailing
        # bytes (would extract k=99), DuckDB's json_valid is RFC-strict
        # — these rows pin the strict contract enforced by
        # functions/jsonx.py in events_json_props/events_json_variant.
        # k=99 > the k>50 filter cut so a lenient engine CHANGES sum_k.
        (100063, datetime.datetime(2024, 1, 17, 0, 0, 3), 900005,
         "view", 1.0, '{"k": 99} trash'),
        (100064, datetime.datetime(2024, 1, 17, 0, 0, 4), 900005,
         "view", 1.0, '{"k": 99}}'),
        (100065, datetime.datetime(2024, 1, 17, 0, 0, 5), 900005,
         "view", 1.0, '{"k": 81} {"k": 82}'),
        # NaN constant: BOTH validators accept it ('{"k": NaN}' is
        # json_valid in DuckDB and json.loads-parsable), so the typed
        # extraction must TRY_CAST — a strict BIGINT cast of 'NaN'
        # crashes both engines under ANSI
        (100066, datetime.datetime(2024, 1, 17, 0, 0, 6), 900005,
         "view", 1.0, '{"k": NaN}'),
    ]
)


def build(dst: str = DST, src: str = SRC) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_TABLES:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    con.execute(
        "CREATE TABLE doc_poison (doc_id BIGINT, text VARCHAR, "
        "lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO doc_poison VALUES (?, ?, ?, ?, ?)", DOC_ROWS
    )
    con.execute(
        f"COPY (SELECT * FROM '{src}/documents.parquet' UNION ALL "
        f"SELECT * FROM doc_poison ORDER BY doc_id) TO "
        f"'{dst}/documents.parquet' (FORMAT PARQUET)"
    )

    con.execute(
        "CREATE TABLE emb_poison (vec_id BIGINT, embedding FLOAT[], "
        "label INTEGER)"
    )
    rows = []
    for vid, emb, label in EMB_ROWS:
        if emb == "NULL_ELEMENTS":
            emb = [None] * 64
        rows.append((vid, emb, label))
    # exact duplicate of benign vec_id 7 under a new id: tied top-k
    # scores force deterministic tie-breaks (or expose their absence)
    dup = con.execute(
        f"SELECT embedding FROM '{src}/embeddings.parquet' WHERE vec_id = 7"
    ).fetchone()[0]
    rows.append((100006, dup, 6))
    con.executemany("INSERT INTO emb_poison VALUES (?, ?, ?)", rows)
    con.execute(
        "INSERT INTO emb_poison SELECT 100007, "
        "array_value(" + ", ".join(["'nan'::FLOAT"] * 64) + "), 7"
    )
    con.execute(
        f"COPY (SELECT * FROM '{src}/embeddings.parquet' UNION ALL "
        f"SELECT * FROM emb_poison ORDER BY vec_id) TO "
        f"'{dst}/embeddings.parquet' (FORMAT PARQUET)"
    )

    con.execute(
        "CREATE TABLE evt_poison (event_id BIGINT, ts TIMESTAMP, "
        "user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany(
        "INSERT INTO evt_poison VALUES (?, ?, ?, ?, ?, ?)", EVT_ROWS
    )
    con.execute(
        f"COPY (SELECT * FROM '{src}/events.parquet' UNION ALL "
        f"SELECT * FROM evt_poison ORDER BY event_id) TO "
        f"'{dst}/events.parquet' (FORMAT PARQUET)"
    )
    print(f"poison replica written to {dst}")


if __name__ == "__main__":
    # poison_corpus.py [dst] [src]: e.g. a sf0.01-based replica via
    #   python tools/poison_corpus.py /tmp/poison_sf0.01 /root/testdata/sf0.01
    build(
        sys.argv[1] if len(sys.argv) > 1 else DST,
        sys.argv[2] if len(sys.argv) > 2 else SRC,
    )
