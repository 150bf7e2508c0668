from crawld_spark.streaming.rounds_stream import StreamingCrawl  # noqa: F401
from crawld_spark.streaming.metrics_stream import (  # noqa: F401
    politeness_decisions_stateful,
    windowed_event_metrics,
)
from crawld_spark.streaming.neardup_stream import StreamingNearDup  # noqa: F401
