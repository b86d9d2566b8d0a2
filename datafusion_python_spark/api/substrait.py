"""Plan interchange surface (ref python/datafusion/substrait.py:86-188,
unparser.py:27-80).

OSS Spark has no Substrait integration, so the relational core
(read/filter/project/aggregate/join/fetch/sort/set) is implemented
directly against the public substrait spec in
``plans/substrait_plan.py``: ``Serde.serialize*`` produce a Substrait
plan from SQL by walking the Catalyst analyzed plan,
``Consumer.from_substrait_plan`` translates a plan back into a
DataFrame pipeline, and ``Plan.encode``/``Serde.deserialize*`` speak
the protobuf wire format for the supported message subset. Nodes and
expressions outside the subset raise by name instead of emitting wrong
bytes (SURVEY §3.3).
"""

from __future__ import annotations

import pathlib


class Plan:
    """A Substrait plan (ref substrait.py:40-84). Carries the plan IR
    (protobuf-JSON-shaped dict); ``encode`` emits protobuf wire bytes."""

    def __init__(self, plan_ir: dict) -> None:
        self.plan_internal = plan_ir

    def encode(self) -> bytes:
        from ..plans.substrait_plan import encode_plan

        return encode_plan(self.plan_internal)

    def to_json(self) -> str:
        from ..plans.substrait_plan import plan_to_json

        return plan_to_json(self.plan_internal)

    @staticmethod
    def from_json(text: str) -> "Plan":
        from ..plans.substrait_plan import plan_from_json

        return Plan(plan_from_json(text))

    def __repr__(self) -> str:
        rels = self.plan_internal.get("relations", [])
        return f"Plan({len(rels)} relation(s))"


def _spark_of(ctx):
    return getattr(ctx, "spark", None) or ctx


class Serde:
    """Substrait serialization (ref substrait.py:86-148)."""

    @staticmethod
    def serialize(sql: str, ctx, path: str | pathlib.Path) -> None:
        data = Serde.serialize_bytes(sql, ctx)
        pathlib.Path(path).write_bytes(data)

    @staticmethod
    def serialize_to_plan(sql: str, ctx) -> Plan:
        from ..plans.substrait_plan import produce_from_sql

        return Plan(produce_from_sql(_spark_of(ctx), sql))

    @staticmethod
    def serialize_bytes(sql: str, ctx) -> bytes:
        return Serde.serialize_to_plan(sql, ctx).encode()

    @staticmethod
    def deserialize(path: str | pathlib.Path) -> Plan:
        return Serde.deserialize_bytes(pathlib.Path(path).read_bytes())

    @staticmethod
    def deserialize_bytes(proto_bytes: bytes) -> Plan:
        from ..plans.substrait_plan import decode_plan

        return Plan(decode_plan(bytes(proto_bytes)))


class Producer:
    """Logical plan → Substrait plan (ref substrait.py:151-169)."""

    @staticmethod
    def to_substrait_plan(logical_plan, ctx=None) -> Plan:
        from ..plans.substrait_plan import produce_from_plan

        return Plan(produce_from_plan(logical_plan))


class Consumer:
    """Substrait plan → logical plan (ref substrait.py:172-188)."""

    @staticmethod
    def from_substrait_plan(ctx, plan: Plan):
        from ..plans.substrait_plan import consume
        from .plan import LogicalPlan

        ir = plan.plan_internal if isinstance(plan, Plan) else plan
        return LogicalPlan(consume(_spark_of(ctx), ir))


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
