"""Common types (ref python/datafusion/common.py:40-100).

The reference's common module mostly re-exports Rust-internal metadata
types used by its SQL frontend; the user-facing pieces — NullTreatment
and DFSchema — are provided here over Spark/Arrow equivalents. The
SQL-frontend metadata classes (SqlTable/SqlView/RexType/...) describe
DataFusion's internal representation and have no Spark-side meaning;
they are intentionally absent rather than stubbed with fake shapes.
"""

from __future__ import annotations

from enum import Enum


class RexType(Enum):
    """Coarse expression kind (ref common.py RexType — row-expression
    taxonomy used by Expr.rex_type): a literal value, a column
    reference, an alias, a function/operator call, a scalar subquery,
    or other."""

    Alias = "alias"
    Literal = "literal"
    Call = "call"
    Reference = "reference"
    ScalarSubquery = "scalar_subquery"
    Other = "other"


class NullTreatment(Enum):
    """How aggregate/window functions treat nulls (ref common.py:59)."""

    RESPECT_NULLS = "respect nulls"
    IGNORE_NULLS = "ignore nulls"


class DFSchema:
    """Schema wrapper (ref common.py DFSchema) over a pyarrow schema."""

    def __init__(self, schema) -> None:
        self._schema = schema

    @classmethod
    def from_dataframe(cls, df) -> "DFSchema":
        sdf = getattr(df, "df", df)
        return cls(sdf.limit(0).toArrow().schema)

    def field_names(self) -> list[str]:
        return list(self._schema.names)

    def to_pyarrow(self):
        return self._schema

    def __repr__(self) -> str:
        return f"DFSchema({self.field_names()})"


__all__ = ["DFSchema", "NullTreatment"]
