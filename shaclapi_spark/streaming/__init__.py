from shaclapi_spark.streaming.cdc import (  # noqa: F401
    apply_changelog,
    empty_changelog,
    latest_verdicts,
    revalidate_changelog_stream,
)
from shaclapi_spark.streaming.drift import (  # noqa: F401
    windowed_psi,
)
from shaclapi_spark.streaming.joins import (  # noqa: F401
    stream_interval_join,
)
from shaclapi_spark.streaming.incremental import (  # noqa: F401
    row_verdict_stream,
    validate_stream,
)
from shaclapi_spark.streaming.windows import (  # noqa: F401
    streaming_entity_counts,
    windowed_event_counts,
)
