from dataquality_ml_spark.sources.readers import (
    load_tables,
    read_csv,
    read_parquet,
    read_table,
)
from dataquality_ml_spark.sources.writers import (
    write_csv_report,
    write_iceberg,
    write_parquet,
)

__all__ = [
    "load_tables",
    "read_csv",
    "read_parquet",
    "read_table",
    "write_csv_report",
    "write_iceberg",
    "write_parquet",
]
