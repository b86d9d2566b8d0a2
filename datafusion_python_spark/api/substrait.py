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


class Dialect:
    """SQL dialect marker (ref unparser.py:27-57). Constructors mirror
    the reference; the dialect is carried for signature parity — plan
    unparsing itself is unsupported on Spark (see :class:`Unparser`)."""

    def __init__(self, name: str = "default") -> None:
        self.name = name

    @staticmethod
    def default() -> "Dialect":
        return Dialect("default")

    @staticmethod
    def mysql() -> "Dialect":
        return Dialect("mysql")

    @staticmethod
    def postgres() -> "Dialect":
        return Dialect("postgres")

    @staticmethod
    def sqlite() -> "Dialect":
        return Dialect("sqlite")

    @staticmethod
    def duckdb() -> "Dialect":
        return Dialect("duckdb")

    def __repr__(self) -> str:
        return f"Dialect({self.name})"


class Unparser:
    """ref unparser.py:60-80 — plan → SQL text.

    Walks the Catalyst analyzed plan and re-emits executable SQL
    (``plans/unparse.py``); expressions render through Catalyst's own
    ``Expression.sql``, so aliases, casts, aggregates and window calls
    round-trip. Dialects affect identifier quoting (backticks for
    default/mysql, double quotes for postgres/duckdb/sqlite)."""

    def __init__(self, dialect: "Dialect | str" = "default") -> None:
        self.dialect = dialect if isinstance(dialect, Dialect) else Dialect(str(dialect))
        self._pretty = False

    def with_pretty(self, pretty: bool = True) -> "Unparser":
        """Toggle pretty-printing (ref unparser.py with_pretty)."""
        self._pretty = pretty
        return self

    def plan_to_sql(self, plan) -> str:
        from ..plans.unparse import plan_to_sql

        return plan_to_sql(plan, dialect=self.dialect.name, pretty=self._pretty)
