"""Print the formatted physical plan of any registry query.

Usage: python tools/explain_query.py <query_name> [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from sec_edgar_spark.session import get_spark
    import sec_edgar_spark.queries as Q

    qs = Q.queries()
    if name not in qs:
        print(f"unknown query {name!r}; {len(qs)} registered")
        return 2
    spark = get_spark(
        app_name="explain", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs[name](spark, sf_dir).explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
