from crawld_spark.streaming.rounds_stream import StreamingCrawl  # noqa: F401
