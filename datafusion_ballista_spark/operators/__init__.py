"""Custom distributed operators the stock DataFrame API lacks."""

from datafusion_ballista_spark.operators.global_window import (  # noqa: F401
    global_rank,
    global_row_number,
    global_running_sum,
)
