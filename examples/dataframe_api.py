#!/usr/bin/env python
"""DataFrame API — the analogue of the reference's
``examples/examples/remote-dataframe.rs``: read a parquet source, then
select/filter with the DataFrame API instead of SQL.

Usage: python examples/dataframe_api.py [data_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_ballista_spark import BallistaSession


def main() -> None:
    data = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bs = BallistaSession.standalone(cpus=2)
    # remote-dataframe.rs: read_parquet().select_columns().filter()
    df = (
        bs.read_parquet(f"{data}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .filter(F.col("o_totalprice") > F.lit(100000.0))
        .orderBy(F.desc("o_totalprice"))
        .limit(10)
    )
    df.show()
    # column pruning + pushed filter are visible in the physical plan
    df.explain("formatted")
    bs.stop()


if __name__ == "__main__":
    main()
