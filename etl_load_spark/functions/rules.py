"""Named transformation-rule registry (U2).

The reference declares per-field ``transformationRule`` strings
(etlModel.java:100-101, e.g. "UPPERCASE", "TRIM") but never wires them; here
they are first-class: a dict of rule-name → (Column → Column), applied by the
plan builder before the destination cast. All rules are built-in functions —
no Python on the hot path. Extend via ``register_rule``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, functions as F

RULES: dict[str, Callable[[Column], Column]] = {
    "UPPERCASE": F.upper,
    "LOWERCASE": F.lower,
    "TRIM": F.trim,
    "LTRIM": F.ltrim,
    "RTRIM": F.rtrim,
    "NORMALIZE_WS": lambda c: F.regexp_replace(F.trim(c), r"\s+", " "),
    "TITLECASE": F.initcap,
    "REVERSE": F.reverse,
    "MD5": F.md5,
    "SHA256": lambda c: F.sha2(c.cast("string"), 256),
    "ABS": F.abs,
    "NEGATE": lambda c: -c,
}


def register_rule(name: str, fn: Callable[[Column], Column]) -> None:
    RULES[name.upper()] = fn


def apply_rule(col: Column, rule: str | None) -> Column:
    """Apply a named rule; unknown/None rule is a no-op (reference logs+skips)."""
    if not rule or rule.upper() in ("", "NONE"):
        return col
    fn = RULES.get(rule.upper())
    return fn(col) if fn else col
