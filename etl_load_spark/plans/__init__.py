from etl_load_spark.plans.builder import build_mapping_plan, build_plan  # noqa: F401
