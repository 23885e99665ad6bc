#!/usr/bin/env python
"""Standalone SQL — the analogue of the reference's
``examples/examples/standalone-sql.rs``: build an in-process session,
register a parquet file, run SQL, show the result.

Usage: python examples/standalone_sql.py [data_dir]
(data_dir defaults to /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_ballista_spark import BallistaSession


def main() -> None:
    data = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # standalone-sql.rs: with_target_partitions(1) +
    # standalone_parallelism(2) -> local session, bounded parallelism
    bs = BallistaSession.standalone(cpus=2)
    bs.register_parquet("test", f"{data}/lineitem.parquet")
    bs.sql("SELECT COUNT(1) AS cnt FROM test").show()
    # the reference gates on TPC-H; one aggregation with a filter shows
    # predicate pushdown + partial aggregation end to end
    bs.sql(
        """
        SELECT l_returnflag, COUNT(*) AS orders, SUM(l_quantity) AS qty
        FROM test
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    ).show()
    bs.stop()


if __name__ == "__main__":
    main()
