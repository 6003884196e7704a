from .batch import read_csv_bronze, read_parquet_table
from .streams import stream_parquet_bronze, stream_rate_bronze

__all__ = [
    "read_csv_bronze",
    "read_parquet_table",
    "stream_parquet_bronze",
    "stream_rate_bronze",
]
