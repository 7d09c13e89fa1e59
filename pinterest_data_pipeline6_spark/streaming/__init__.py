from pinterest_data_pipeline6_spark.streaming.jobs import (  # noqa: F401
    clean_stream,
    read_payload_stream,
    run_streaming_pipeline,
    watermarked_geo_dedup,
    windowed_event_counts,
    write_append,
)
