"""Source facade: batch and streaming readers with engine defaults.

Everything is schema-first (no runtime inference jobs at 100 TB) and
returns plain DataFrames — sources are just plan leaves.
"""

from tutorial_apache_beam_spark.sources.readers import (
    publish_kafka,
    read_csv,
    read_json,
    read_parquet,
    stream_directory_json,
    stream_directory_text,
    stream_kafka,
    stream_rate,
    to_kafka_wire,
)

__all__ = [
    "publish_kafka",
    "read_csv",
    "read_json",
    "read_parquet",
    "stream_directory_json",
    "stream_directory_text",
    "stream_kafka",
    "stream_rate",
    "to_kafka_wire",
]
