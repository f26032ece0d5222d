"""CLI facade (reference parity: secedgar's click CLI, cli.py:43-126).

The reference CLI builds a CompanyFilings/DailyFilings object and calls
``save``; here the same arguments build the declarative ``filings()``
plan over an index mirror and either show the matches or write them as
parquet.  Network-free: runs against a mirror directory (the scale
path).

    python -m sec_edgar_spark.cli \
        --index GLOB [--filing-type 10-K] [--start YYYY-MM-DD]
        [--end YYYY-MM-DD] [--count N] [--lookup AAPL --cik-map FILE]
        [--out DIR | --show N]
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sec-edgar-spark", description=__doc__)
    p.add_argument("--index", required=True, help="master.idx file/glob or parquet mirror dir")
    p.add_argument("--filing-type", help="form type, e.g. 10-K")
    p.add_argument("--start", help="start date YYYY-MM-DD")
    p.add_argument("--end", help="end date YYYY-MM-DD")
    p.add_argument("--count", type=int, help="newest N filings per company")
    p.add_argument("--lookup", action="append", help="ticker/title/CIK (repeatable)")
    p.add_argument("--cik-map", help="company_tickers.json path (required with --lookup)")
    p.add_argument("--out", help="write matching rows as parquet here")
    p.add_argument("--show", type=int, default=20, help="print first N rows (no --out)")
    p.add_argument(
        "--to-mirror",
        help="write the scanned index as a (year, quarter)-partitioned "
        "parquet mirror here (the layout every date filter "
        "partition-prunes against), then exit",
    )
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    from .plans.filings import filings
    from .session import get_spark
    from .sources.index import read_master_idx

    spark = spark or get_spark(app_name="sec-edgar-spark-cli")
    if args.filing_type and args.filing_type.startswith("FILING_"):
        # Reference-CLI parity: accept enum NAMES like FILING_10K
        # (ref cli.py:90-93 FilingType[ftype] lookup).
        from .filing_types import FilingTypeError, filing_type_enum

        try:
            args.filing_type = filing_type_enum()[args.filing_type]
        except KeyError:
            raise FilingTypeError(f"invalid filing type: {args.filing_type!r}")
    if args.index.endswith(".idx") or "*" in args.index:
        index = read_master_idx(spark, args.index)
    else:
        index = spark.read.parquet(args.index)

    if args.to_mirror:
        from .sources.index import to_parquet_mirror

        to_parquet_mirror(index, args.to_mirror)
        print(f"mirrored {args.to_mirror}")
        return 0

    cik_lookup = cik_map = None
    if args.lookup:
        if not args.cik_map:
            raise SystemExit("--lookup requires --cik-map")
        from .sources.cik_map import read_cik_map

        cik_map = read_cik_map(spark, args.cik_map)
        cik_lookup = spark.createDataFrame(
            [(t,) for t in args.lookup], ["lookup_term"]
        )

    plan = filings(
        index,
        filing_type=args.filing_type,
        start_date=args.start,
        end_date=args.end,
        count=args.count,
        cik_lookup=cik_lookup,
        cik_map=cik_map,
    )
    if args.out:
        plan.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        plan.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
