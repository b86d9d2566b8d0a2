"""Plan interchange surface (ref python/datafusion/substrait.py:86-188,
unparser.py:27-80).

OSS Spark has no Substrait producer/consumer — the nearest analogue is
the Spark Connect protobuf plan, which is not wire-compatible with
Substrait. Rather than silently produce wrong bytes, this module keeps
the reference's class names and raises with the migration story:
plans ARE portable in PySpark via the DataFrame/SQL text itself, and
pickling of DataFrame-producing closures is native (SURVEY §3.3).
"""

from __future__ import annotations

_MSG = (
    "Substrait interchange is not available on OSS Spark; use SQL text "
    "(spark.sql) or Spark Connect protobuf plans for plan transport. "
    "Pickling of plan-producing functions works natively in PySpark."
)


class Serde:
    @staticmethod
    def serialize(sql: str, ctx, path: str) -> None:
        raise NotImplementedError(_MSG)

    @staticmethod
    def serialize_to_plan(sql: str, ctx):
        raise NotImplementedError(_MSG)

    serialize_bytes = serialize_to_plan
    deserialize = serialize_to_plan
    deserialize_bytes = serialize_to_plan


class Producer:
    @staticmethod
    def to_substrait_plan(logical_plan, ctx):
        raise NotImplementedError(_MSG)


class Consumer:
    @staticmethod
    def from_substrait_plan(ctx, plan):
        raise NotImplementedError(_MSG)


class Unparser:
    """ref unparser.py — plan → SQL text. Spark keeps SQL as the portable
    form already; round-tripping an arbitrary optimized plan back to SQL
    is not supported."""

    def __init__(self, dialect: str = "default") -> None:
        self.dialect = dialect

    def plan_to_sql(self, plan) -> str:
        raise NotImplementedError(_MSG)
