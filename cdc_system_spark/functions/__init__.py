from cdc_system_spark.functions.portable import (
    davg,
    dsum,
    md5_i64,
    shingles,
)

__all__ = ["davg", "dsum", "md5_i64", "shingles"]
