from pinterest_data_pipeline6_spark.functions.cleaning import (  # noqa: F401
    clean_geo,
    clean_pin,
    clean_user,
    dedup_arbitrary,
    dedup_deterministic,
    normalize_sentinels,
    rewrite_follower_count,
)
