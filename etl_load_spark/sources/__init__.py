from etl_load_spark.sources.registry import (  # noqa: F401
    read_source, write_sink, register_reader, register_writer,
)
