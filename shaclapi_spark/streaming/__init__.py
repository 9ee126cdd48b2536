from shaclapi_spark.streaming.incremental import (  # noqa: F401
    row_verdict_stream,
    validate_stream,
)
