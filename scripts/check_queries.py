"""Run a subset of declared queries against their DuckDB oracles at a given
SF — the local pre-flight for new registrations.

Usage: python scripts/check_queries.py sf_dir name1 name2 ...
       (no names = every registered query)
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb  # noqa: E402

from bicis_spark.plans import queries as registry  # noqa: E402
from bicis_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import assert_oracle_match  # noqa: E402

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    all_q = registry.queries()
    oracles = registry.oracle_sql()
    if not names:
        names = list(all_q)
    spark = get_spark(app_name="check_queries", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    failed = []
    for name in names:
        try:
            df = all_q[name](spark, sf_dir)
            if name in oracles:
                assert_oracle_match(df, con, oracles[name], name)
                print(f"PASS {name}")
            else:
                n = df.count()
                print(f"ROWS-ONLY {name}: {n} rows")
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: {e}")
            traceback.print_exc(limit=3)
    print(f"\n{len(names) - len(failed)}/{len(names)} ok; failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
