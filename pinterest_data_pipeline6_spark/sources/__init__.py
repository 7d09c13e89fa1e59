from pinterest_data_pipeline6_spark.sources.readers import (  # noqa: F401
    load_testdata_tables,
    read_raw_json,
    read_raw_parquet,
    register_cleaned_views,
)
