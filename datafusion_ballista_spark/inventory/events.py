"""Placeholder — populated in this round."""
from datafusion_ballista_spark.inventory import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
