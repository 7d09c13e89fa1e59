from pinterest_data_pipeline6_spark.plans.checks import (  # noqa: F401
    LOW_CARDINALITY_COLUMNS,
    executed_plan,
    final_plan,
    has_broadcast_join,
    has_pushed_filter,
    has_take_ordered,
    nested_hof_filters,
    plan_audit,
    raw_low_cardinality_exchanges,
    read_schema_columns,
    wholestage_codegen_count,
)
