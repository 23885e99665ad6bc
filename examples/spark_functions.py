#!/usr/bin/env python
"""Scalar-function surface — the analogue of the reference's
``examples/examples/remote-spark-functions.rs`` (which demonstrates
DataFusion's `datafusion-spark` Spark-compatible functions): the same
sha1/upper/length/expm1 expressions, natively Spark here.

Usage: python examples/spark_functions.py [data_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_ballista_spark import BallistaSession


def main() -> None:
    data = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bs = BallistaSession.standalone(cpus=2)
    bs.register_parquet("test", f"{data}/customer.parquet")
    # remote-spark-functions.rs runs exactly this shape of projection
    bs.sql(
        """
        SELECT
            sha1(c_name) AS hash,
            upper(c_name) AS uppercase,
            length(c_name) AS length,
            expm1(0.001) AS precise_value,
            exp(0.001) - 1 AS standard_value
        FROM test
        ORDER BY c_custkey
        LIMIT 5
        """
    ).show(truncate=False)
    bs.stop()


if __name__ == "__main__":
    main()
