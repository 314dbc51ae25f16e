from etl_load_spark.functions.casts import cast_column  # noqa: F401
from etl_load_spark.functions.rules import apply_rule, RULES  # noqa: F401
