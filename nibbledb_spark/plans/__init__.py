"""Plan-shaping utilities for scale: shuffle elimination (bucketing),
skew mitigation (salting), and plan inspection."""

from nibbledb_spark.plans.scale import (  # noqa: F401
    bucket_table,
    exchange_count,
    plan_string,
    salted_join,
)
