"""Reference-parity cast semantics as Catalyst column expressions.

The reference's cast matrix (ETLCoreMappingProcessor.java:149-253) has quirks
Spark's plain ``cast`` doesn't reproduce:

  - strings are trimmed before numeric parsing (:167,173,179,187,195)
  - truthy strings "true"/"1"/"y"/"yes" → true, numbers → ``!= 0`` (:190-197)
  - timestamps accept ISO datetime, date-only, and a declared format pattern
    with fallbacks (:200-217)
  - DATE truncates any time part (:219-233)
  - unknown destination types pass the value through (:237-240)

All of it is expressed with built-in functions (JVM-side, codegen'd) — no
Python UDFs on this path. Invalid values become NULL (Spark ANSI-off
semantics), which the error-routing operator (operators.errors) then counts
against ``maxErrorsAllowed`` — SURVEY.md §7.5 documents this divergence from
the reference's throw-per-row model.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from etl_load_spark.types import ddl_for

_TRUTHY = ("true", "1", "y", "yes")
_FALSY = ("false", "0", "n", "no")


def _to_boolean(col: Column) -> Column:
    """Truthy-string / nonzero-number boolean (ETLCoreMappingProcessor.java:190-197)."""
    s = F.lower(F.trim(col.cast("string")))
    return (
        F.when(col.isNull(), F.lit(None).cast("boolean"))
        .when(s.isin(*_TRUTHY), F.lit(True))
        .when(s.isin(*_FALSY), F.lit(False))
        # numeric strings: != 0 is true (reference Number branch :193);
        # try_cast keeps invalid input NULL under ANSI mode (Spark 4 default)
        .when(s.try_cast("double").isNotNull(), s.try_cast("double") != 0)
        .otherwise(F.lit(None).cast("boolean"))
    )


def _to_timestamp(col: Column, fmt: str | None) -> Column:
    """Multi-format timestamp parse with fallbacks (:200-217).

    Order: declared formatPattern → ISO datetime → date-only. Non-string
    inputs go through the native cast.
    """
    s = F.trim(col.cast("string"))
    candidates = []
    if fmt:
        candidates.append(F.try_to_timestamp(s, F.lit(fmt)))
    candidates.append(F.try_to_timestamp(s))
    candidates.append(s.try_cast("date").cast("timestamp"))
    return F.coalesce(*candidates)


def cast_column(col: Column, dest_type, fmt: str | None = None) -> Column:
    """Cast ``col`` to the declared destination type with reference semantics."""
    ddl = ddl_for(dest_type)
    base = ddl.split("(")[0]
    if base == "boolean":
        return _to_boolean(col)
    if base == "timestamp":
        return _to_timestamp(col, fmt)
    if base == "date":
        # truncates time part (:223); formatPattern honored via the
        # timestamp parse chain
        return _to_timestamp(col, fmt).cast("date")
    if base in ("bigint", "int", "smallint", "tinyint", "double", "float",
                "decimal"):
        # trim-before-parse (:167-187); try_cast → NULL on non-numeric input
        # rather than an ANSI runtime error (error routing counts the NULLs)
        return F.trim(col.cast("string")).try_cast(ddl)
    if base == "string":
        return col.cast("string")
    return col.try_cast(ddl)
