"""Substrait plan interchange for the relational core (ref
python/datafusion/substrait.py:86-188).

The reference serializes SQL/logical plans to Substrait protobufs and
consumes them back. This environment has no substrait library, so this
module implements the subset directly against the PUBLIC substrait spec
(substrait.io, proto/substrait/{plan,algebra,type}.proto):

- an in-memory plan IR shaped exactly like Substrait's protobuf-JSON
  (camelCase field names, oneof-as-single-key) — ``Plan.to_json`` /
  ``from_json`` speak that text format;
- a hand-rolled protobuf WIRE codec (varint/zigzag-free subset: varint,
  64-bit, length-delimited) driven by one message-schema table, so
  ``encode``/``decode`` round-trip bytes;
- a producer that walks the Catalyst ANALYZED plan of a SQL query into
  the IR (ReadRel/FilterRel/ProjectRel/AggregateRel/JoinRel/FetchRel/
  SortRel/SetRel + field references by ordinal, literals, and scalar/
  aggregate functions declared through extension anchors, as the spec
  requires);
- a consumer translating the IR back to a DataFrame pipeline.

Field numbers follow the substrait core protos; the encoder covers only
the subset in ``_MESSAGES`` and always round-trips with the decoder
here. Cross-engine byte compatibility cannot be integration-tested in
this container (no substrait consumer available) — unsupported nodes
raise by name rather than emitting wrong bytes.
"""

from __future__ import annotations

import json
import struct
from typing import Any

# --------------------------------------------------------------------------
# Message schema: name -> {json_field: (number, kind[, msg_type])}
# kind ∈ msg | rep (repeated msg) | str | rep_str | u64 | i64 | i32 |
#        rep_i32 | f64 | bool | enum

_MESSAGES: dict[str, dict[str, tuple]] = {
    "Plan": {
        "extensionUris": (1, "rep", "SimpleExtensionURI"),
        "extensions": (2, "rep", "SimpleExtensionDeclaration"),
        "relations": (3, "rep", "PlanRel"),
    },
    "SimpleExtensionURI": {"extensionUriAnchor": (1, "u64"), "uri": (2, "str")},
    "SimpleExtensionDeclaration": {
        "extensionFunction": (3, "msg", "ExtensionFunction"),
    },
    "ExtensionFunction": {
        "extensionUriReference": (1, "u64"),
        "functionAnchor": (2, "u64"),
        "name": (3, "str"),
    },
    "PlanRel": {"rel": (1, "msg", "Rel"), "root": (2, "msg", "RelRoot")},
    "RelRoot": {"input": (1, "msg", "Rel"), "names": (2, "rep_str")},
    "Rel": {
        "read": (1, "msg", "ReadRel"),
        "filter": (2, "msg", "FilterRel"),
        "fetch": (3, "msg", "FetchRel"),
        "aggregate": (4, "msg", "AggregateRel"),
        "sort": (5, "msg", "SortRel"),
        "join": (6, "msg", "JoinRel"),
        "project": (7, "msg", "ProjectRel"),
        "set": (8, "msg", "SetRel"),
        "cross": (12, "msg", "CrossRel"),
    },
    "ReadRel": {
        "baseSchema": (2, "msg", "NamedStruct"),
        "filter": (3, "msg", "Expression"),
        "namedTable": (7, "msg", "NamedTable"),
    },
    "NamedTable": {"names": (1, "rep_str")},
    "FilterRel": {"input": (2, "msg", "Rel"), "condition": (3, "msg", "Expression")},
    "FetchRel": {"input": (2, "msg", "Rel"), "offset": (3, "i64"), "count": (4, "i64")},
    "ProjectRel": {
        "common": (1, "msg", "RelCommon"),
        "input": (2, "msg", "Rel"),
        "expressions": (3, "rep", "Expression"),
    },
    "RelCommon": {"emit": (2, "msg", "RelCommonEmit")},
    "RelCommonEmit": {"outputMapping": (1, "rep_i32")},
    "SortRel": {"input": (2, "msg", "Rel"), "sorts": (3, "rep", "SortField")},
    "SortField": {"expr": (1, "msg", "Expression"), "direction": (2, "enum")},
    "AggregateRel": {
        "input": (2, "msg", "Rel"),
        "groupings": (3, "rep", "Grouping"),
        "measures": (4, "rep", "Measure"),
    },
    "Grouping": {"groupingExpressions": (1, "rep", "Expression")},
    "Measure": {"measure": (1, "msg", "AggregateFunction")},
    "AggregateFunction": {
        "functionReference": (1, "u64"),
        "phase": (4, "enum"),
        "invocation": (6, "enum"),
        "arguments": (7, "rep", "FunctionArgument"),
    },
    "JoinRel": {
        "left": (2, "msg", "Rel"),
        "right": (3, "msg", "Rel"),
        "expression": (4, "msg", "Expression"),
        "type": (6, "enum"),
    },
    "SetRel": {"inputs": (2, "rep", "Rel"), "op": (3, "enum")},
    "CrossRel": {"left": (2, "msg", "Rel"), "right": (3, "msg", "Rel")},
    "Expression": {
        "literal": (1, "msg", "Literal"),
        "selection": (2, "msg", "FieldReference"),
        "scalarFunction": (3, "msg", "ScalarFunction"),
        "cast": (9, "msg", "Cast"),
    },
    "Cast": {
        "type": (1, "msg", "Type"),
        "input": (2, "msg", "Expression"),
        "failureBehavior": (3, "enum"),
    },
    "Literal": {
        "boolean": (1, "bool"),
        "i32": (5, "i32"),
        "i64": (7, "i64"),
        "fp64": (11, "f64"),
        "string": (12, "str"),
        "date": (16, "i32"),
    },
    "FieldReference": {
        "directReference": (1, "msg", "ReferenceSegment"),
        "rootReference": (4, "msg", "RootReference"),
    },
    "RootReference": {},
    "ReferenceSegment": {"structField": (2, "msg", "StructField")},
    "StructField": {"field": (1, "i32")},
    "ScalarFunction": {
        "functionReference": (1, "u64"),
        "arguments": (4, "rep", "FunctionArgument"),
    },
    "FunctionArgument": {"value": (3, "msg", "Expression")},
    "NamedStruct": {"names": (1, "rep_str"), "struct": (2, "msg", "TypeStruct")},
    "TypeStruct": {"types": (1, "rep", "Type"), "nullability": (3, "enum")},
    "Type": {
        "bool": (1, "msg", "TypeUnit"),
        "i32": (5, "msg", "TypeUnit"),
        "i64": (7, "msg", "TypeUnit"),
        "fp64": (11, "msg", "TypeUnit"),
        "string": (12, "msg", "TypeUnit"),
        "timestamp": (14, "msg", "TypeUnit"),
        "date": (16, "msg", "TypeUnit"),
        "decimal": (24, "msg", "TypeDecimal"),
    },
    "TypeUnit": {"nullability": (2, "enum")},
    "TypeDecimal": {
        "scale": (1, "i32"),
        "precision": (2, "i32"),
        "nullability": (4, "enum"),
    },
}


# --------------------------------------------------------------------------
# Protobuf wire codec (spec: protobuf.dev/programming-guides/encoding)


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def encode_message(msg_type: str, value: dict) -> bytes:
    schema = _MESSAGES[msg_type]
    out = bytearray()
    for key, val in value.items():
        if key not in schema:
            raise NotImplementedError(
                f"substrait encode: field {msg_type}.{key} outside the "
                "supported subset"
            )
        spec = schema[key]
        num, kind = spec[0], spec[1]
        if kind == "msg":
            body = encode_message(spec[2], val)
            out += _tag(num, 2) + _varint(len(body)) + body
        elif kind == "rep":
            for item in val:
                body = encode_message(spec[2], item)
                out += _tag(num, 2) + _varint(len(body)) + body
        elif kind == "str":
            raw = val.encode("utf-8")
            out += _tag(num, 2) + _varint(len(raw)) + raw
        elif kind == "rep_str":
            for s in val:
                raw = s.encode("utf-8")
                out += _tag(num, 2) + _varint(len(raw)) + raw
        elif kind in ("u64", "i64", "i32", "enum"):
            out += _tag(num, 0) + _varint(int(val) & 0xFFFFFFFFFFFFFFFF)
        elif kind == "rep_i32":
            for v in val:
                out += _tag(num, 0) + _varint(int(v) & 0xFFFFFFFFFFFFFFFF)
        elif kind == "bool":
            out += _tag(num, 0) + _varint(1 if val else 0)
        elif kind == "f64":
            out += _tag(num, 1) + struct.pack("<d", float(val))
        else:  # pragma: no cover
            raise AssertionError(kind)
    return bytes(out)


def decode_message(msg_type: str, buf: bytes) -> dict:
    schema = _MESSAGES[msg_type]
    by_num = {spec[0]: (name, spec) for name, spec in schema.items()}
    out: dict[str, Any] = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        num, wire = key >> 3, key & 7
        if num not in by_num:
            raise NotImplementedError(
                f"substrait decode: unknown field #{num} in {msg_type}"
            )
        name, spec = by_num[num]
        kind = spec[1]
        if wire == 2:
            ln, pos = _read_varint(buf, pos)
            raw = buf[pos : pos + ln]
            pos += ln
            if kind == "msg":
                out[name] = decode_message(spec[2], raw)
            elif kind == "rep":
                out.setdefault(name, []).append(decode_message(spec[2], raw))
            elif kind == "str":
                out[name] = raw.decode("utf-8")
            elif kind == "rep_str":
                out.setdefault(name, []).append(raw.decode("utf-8"))
            else:
                raise NotImplementedError(f"wire 2 for {msg_type}.{name}")
        elif wire == 0:
            v, pos = _read_varint(buf, pos)
            if kind == "bool":
                out[name] = bool(v)
            elif kind == "rep_i32":
                out.setdefault(name, []).append(v)
            elif kind in ("i32", "i64"):
                # two's-complement back to signed
                bits = 32 if kind == "i32" else 64
                if v >= 1 << (bits * 2 - 1):  # encoded as 64-bit varint
                    v -= 1 << 64
                out[name] = v
            else:
                out[name] = v
        elif wire == 1:
            out[name] = struct.unpack("<d", buf[pos : pos + 8])[0]
            pos += 8
        else:
            raise NotImplementedError(f"wire type {wire}")
    return out


# --------------------------------------------------------------------------
# Function registry: substrait canonical names <-> engine operations

_FN_URI = "https://github.com/substrait-io/substrait/blob/main/extensions/"

# canonical name (before the ':' signature) -> (extension file, spark op)
_SCALAR_FNS = {
    "gt": "functions_comparison.yaml",
    "gte": "functions_comparison.yaml",
    "lt": "functions_comparison.yaml",
    "lte": "functions_comparison.yaml",
    "equal": "functions_comparison.yaml",
    "not_equal": "functions_comparison.yaml",
    "and": "functions_boolean.yaml",
    "or": "functions_boolean.yaml",
    "not": "functions_boolean.yaml",
    "add": "functions_arithmetic.yaml",
    "subtract": "functions_arithmetic.yaml",
    "multiply": "functions_arithmetic.yaml",
    "divide": "functions_arithmetic.yaml",
}
_AGG_FNS = {
    "sum": "functions_arithmetic.yaml",
    "avg": "functions_arithmetic.yaml",
    "min": "functions_arithmetic.yaml",
    "max": "functions_arithmetic.yaml",
    "count": "functions_aggregate_generic.yaml",
}

_CATALYST_TO_FN = {
    "GreaterThan": "gt",
    "GreaterThanOrEqual": "gte",
    "LessThan": "lt",
    "LessThanOrEqual": "lte",
    "EqualTo": "equal",
    "Not": "not",
    "And": "and",
    "Or": "or",
    "Add": "add",
    "Subtract": "subtract",
    "Multiply": "multiply",
    "Divide": "divide",
}
_AGG_CATALYST_TO_FN = {
    "Sum": "sum",
    "Average": "avg",
    "Min": "min",
    "Max": "max",
    "Count": "count",
}


def _seq(s) -> list:
    return [s.apply(i) for i in range(s.size())]


class _FnTable:
    """Extension-function anchor allocation during production."""

    def __init__(self) -> None:
        self.uris: dict[str, int] = {}
        self.fns: dict[str, int] = {}

    def anchor(self, name: str, ext_file: str) -> int:
        uri = _FN_URI + ext_file
        if uri not in self.uris:
            self.uris[uri] = len(self.uris) + 1
        if name not in self.fns:
            self.fns[name] = len(self.fns) + 1
        return self.fns[name]

    def declarations(self) -> tuple[list, list]:
        ext_uris = [
            {"extensionUriAnchor": a, "uri": u} for u, a in self.uris.items()
        ]
        # invert: fn name -> which uri it came from
        fn_uri = {}
        for name in self.fns:
            base = name.split(":", 1)[0]
            ext_file = _SCALAR_FNS.get(base) or _AGG_FNS.get(base) or ""
            fn_uri[name] = self.uris.get(_FN_URI + ext_file, 1)
        decls = [
            {
                "extensionFunction": {
                    "extensionUriReference": fn_uri[name],
                    "functionAnchor": anchor,
                    "name": name,
                }
            }
            for name, anchor in self.fns.items()
        ]
        return ext_uris, decls


# --------------------------------------------------------------------------
# Producer: Catalyst analyzed plan -> IR


_SPARK_TYPE_TO_SUB = {
    "boolean": "bool",
    "integer": "i32",
    "long": "i64",
    "double": "fp64",
    "string": "string",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
}


def _sub_type(dt_name: str, nullable: bool) -> dict:
    key = _SPARK_TYPE_TO_SUB.get(dt_name)
    if key is None:
        raise NotImplementedError(f"substrait produce: type {dt_name}")
    return {key: {"nullability": 1 if nullable else 2}}


class _Producer:
    def __init__(self) -> None:
        self.fns = _FnTable()

    def produce(self, jplan) -> dict:
        root_rel = self.rel(jplan)
        names = [a.name() for a in _seq(jplan.output())]
        ext_uris, decls = self.fns.declarations()
        plan: dict[str, Any] = {}
        if ext_uris:
            plan["extensionUris"] = ext_uris
            plan["extensions"] = decls
        plan["relations"] = [{"root": {"input": root_rel, "names": names}}]
        return plan

    # -- relations ------------------------------------------------------
    def rel(self, p) -> dict:
        name = p.getClass().getSimpleName().rstrip("$")
        fn = getattr(self, f"_{name.lower()}", None)
        if fn is None:
            raise NotImplementedError(f"substrait produce: plan node {name}")
        return fn(p)

    def _attr_index(self, p) -> dict[int, int]:
        """exprId().id() -> ordinal over the node's input attributes
        (children outputs concatenated, the substrait field-ref space)."""
        out = {}
        i = 0
        for child in _seq(p.children()):
            for a in _seq(child.output()):
                out[a.exprId().id()] = i
                i += 1
        return out

    def _subqueryalias(self, p) -> dict:
        return self.rel(p.child())

    def _resolvedhint(self, p) -> dict:
        return self.rel(p.child())

    def _logicalrelation(self, p) -> dict:
        ct = p.catalogTable()
        if ct.isDefined():
            ident = ct.get().identifier()
            names = [ident.table()]
        else:
            raise NotImplementedError(
                "substrait produce: file relation without a catalog/view "
                "name (register a temp view so ReadRel.namedTable has one)"
            )
        return {"read": {"baseSchema": self._schema(p), "namedTable": {"names": names}}}

    def _view(self, p) -> dict:
        return {
            "read": {
                "baseSchema": self._schema(p),
                "namedTable": {"names": [p.desc().identifier().table()]},
            }
        }

    def _schema(self, p) -> dict:
        names, types = [], []
        for a in _seq(p.output()):
            names.append(a.name())
            types.append(_sub_type(a.dataType().typeName(), a.nullable()))
        return {"names": names, "struct": {"types": types, "nullability": 2}}

    def _project(self, p) -> dict:
        idx = self._attr_index(p)
        exprs = [self.expr(e, idx) for e in _seq(p.projectList())]
        # substrait ProjectRel output space = input fields ++ expressions;
        # the emit mapping selects only the expressions (what DataFusion's
        # producer writes)
        n_in = sum(len(_seq(c.output())) for c in _seq(p.children()))
        emit = {"emit": {"outputMapping": [n_in + i for i in range(len(exprs))]}}
        return {
            "project": {
                "common": emit,
                "input": self.rel(p.child()),
                "expressions": exprs,
            }
        }

    def _filter(self, p) -> dict:
        idx = self._attr_index(p)
        return {
            "filter": {
                "input": self.rel(p.child()),
                "condition": self.expr(p.condition(), idx),
            }
        }

    def _aggregate(self, p) -> dict:
        idx = self._attr_index(p)
        groups, measures = [], []
        for e in _seq(p.groupingExpressions()):
            groups.append(self.expr(e, idx))
        for e in _seq(p.aggregateExpressions()):
            node = e
            if node.getClass().getSimpleName() == "Alias":
                node = node.child()
            cls = node.getClass().getSimpleName()
            if cls == "AttributeReference":
                continue  # grouping column replicated in output
            if cls != "AggregateExpression":
                raise NotImplementedError(
                    f"substrait produce: aggregate output {cls}"
                )
            agg_fn = node.aggregateFunction()
            fname = _AGG_CATALYST_TO_FN.get(agg_fn.getClass().getSimpleName())
            if fname is None:
                raise NotImplementedError(
                    f"substrait produce: aggregate {agg_fn.getClass().getSimpleName()}"
                )
            args = [
                {"value": self.expr(c, idx)} for c in _seq(agg_fn.children())
                if c.getClass().getSimpleName() != "Literal" or fname != "count"
            ]
            anchor = self.fns.anchor(f"{fname}:any", _AGG_FNS[fname])
            measures.append(
                {
                    "measure": {
                        "functionReference": anchor,
                        "phase": 2,  # AGGREGATION_PHASE_INITIAL_TO_RESULT
                        "invocation": 1,  # ALL
                        "arguments": args,
                    }
                }
            )
        rel: dict[str, Any] = {"input": self.rel(p.child())}
        rel["groupings"] = [{"groupingExpressions": groups}] if groups else [{}]
        if measures:
            rel["measures"] = measures
        return {"aggregate": rel}

    def _join(self, p) -> dict:
        jt = p.joinType().sql()
        type_map = {"INNER": 1, "FULL OUTER": 2, "LEFT OUTER": 3, "RIGHT OUTER": 4}
        if jt == "CROSS" or not p.condition().isDefined():
            return {
                "cross": {"left": self.rel(p.left()), "right": self.rel(p.right())}
            }
        if jt not in type_map:
            raise NotImplementedError(f"substrait produce: join type {jt}")
        idx = self._attr_index(p)
        return {
            "join": {
                "left": self.rel(p.left()),
                "right": self.rel(p.right()),
                "expression": self.expr(p.condition().get(), idx),
                "type": type_map[jt],
            }
        }

    def _globallimit(self, p) -> dict:
        cnt = int(p.limitExpr().value())  # limitExpr is a Literal
        inner = p.child()
        if inner.getClass().getSimpleName().rstrip("$") == "LocalLimit":
            inner = inner.child()
        return {"fetch": {"input": self.rel(inner), "count": cnt}}

    def _locallimit(self, p) -> dict:
        return {
            "fetch": {
                "input": self.rel(p.child()),
                "count": int(p.limitExpr().value()),
            }
        }

    def _sort(self, p) -> dict:
        idx = self._attr_index(p)
        sorts = []
        for o in _seq(p.order()):
            direction = {
                ("Ascending", "NullsFirst"): 1,
                ("Ascending", "NullsLast"): 2,
                ("Descending", "NullsFirst"): 3,
                ("Descending", "NullsLast"): 4,
            }[
                (
                    o.direction().getClass().getSimpleName().rstrip("$"),
                    o.nullOrdering().getClass().getSimpleName().rstrip("$"),
                )
            ]
            sorts.append({"expr": self.expr(o.child(), idx), "direction": direction})
        return {"sort": {"input": self.rel(p.child()), "sorts": sorts}}

    def _union(self, p) -> dict:
        return {
            "set": {
                "inputs": [self.rel(c) for c in _seq(p.children())],
                "op": 7,  # SET_OP_UNION_ALL
            }
        }

    def _distinct(self, p) -> dict:
        # Distinct == Aggregate over all columns with no measures
        child_rel = self.rel(p.child())
        n = len(_seq(p.child().output()))
        groups = [
            {
                "selection": {
                    "directReference": {"structField": ({"field": i} if i else {})},
                    "rootReference": {},
                }
            }
            for i in range(n)
        ]
        return {
            "aggregate": {
                "input": child_rel,
                "groupings": [{"groupingExpressions": groups}],
            }
        }

    def _deduplicate(self, p) -> dict:
        keys = {a.name() for a in _seq(p.keys())}
        out = [a.name() for a in _seq(p.child().output())]
        if keys == set(out):
            return self._distinct(p)
        raise NotImplementedError("substrait produce: dropDuplicates on key subset")

    # -- expressions ----------------------------------------------------
    def expr(self, e, idx: dict[int, int]) -> dict:
        cls = e.getClass().getSimpleName().rstrip("$")
        if cls == "Alias":
            return self.expr(e.child(), idx)
        if cls == "AttributeReference":
            field = idx.get(e.exprId().id())
            if field is None:
                raise NotImplementedError(
                    f"substrait produce: unresolvable attribute {e.name()}"
                )
            return {
                "selection": {
                    "directReference": {"structField": ({"field": field} if field else {})},
                    "rootReference": {},
                }
            }
        if cls == "Literal":
            return {"literal": self._literal(e)}
        if cls == "Cast":
            return {
                "cast": {
                    "type": _sub_type(e.dataType().typeName(), True),
                    "input": self.expr(e.child(), idx),
                    "failureBehavior": 2,  # THROW_EXCEPTION
                }
            }
        fname = _CATALYST_TO_FN.get(cls)
        if fname is None:
            raise NotImplementedError(f"substrait produce: expression {cls}")
        anchor = self.fns.anchor(f"{fname}:any", _SCALAR_FNS[fname])
        args = [{"value": self.expr(c, idx)} for c in _seq(e.children())]
        return {"scalarFunction": {"functionReference": anchor, "arguments": args}}

    def _literal(self, e) -> dict:
        dt = e.dataType().typeName()
        v = e.value()
        if v is None:
            raise NotImplementedError("substrait produce: typed null literal")
        if dt == "boolean":
            return {"boolean": bool(v)}
        if dt == "integer":
            return {"i32": int(str(v))}
        if dt == "long":
            return {"i64": int(str(v))}
        if dt == "double":
            return {"fp64": float(str(v))}
        if dt == "string":
            return {"string": str(v)}
        if dt == "date":
            return {"date": int(str(v))}  # days since epoch internally
        raise NotImplementedError(f"substrait produce: literal type {dt}")


# --------------------------------------------------------------------------
# Consumer: IR -> DataFrame


class _Consumer:
    def __init__(self, spark) -> None:
        self.spark = spark
        self.fn_names: dict[int, str] = {}

    def consume(self, plan: dict):
        for decl in plan.get("extensions", []):
            ef = decl.get("extensionFunction")
            if ef:
                self.fn_names[ef["functionAnchor"]] = ef["name"].split(":", 1)[0]
        rels = plan.get("relations", [])
        if not rels:
            raise ValueError("substrait consume: plan has no relations")
        entry = rels[0]
        root = entry.get("root")
        if root is None:
            return self.rel(entry["rel"])
        df = self.rel(root["input"])
        names = root.get("names", [])
        if names and len(names) == len(df.columns):
            df = df.toDF(*names)
        return df

    def rel(self, rel: dict):
        from pyspark.sql import functions as F

        if "read" in rel:
            r = rel["read"]
            names = r.get("namedTable", {}).get("names")
            if not names:
                raise NotImplementedError(
                    "substrait consume: only namedTable reads are supported"
                )
            df = self.spark.table(".".join(names))
            want = r.get("baseSchema", {}).get("names")
            if want:
                df = df.select(*want)
            if "filter" in r:
                df = df.filter(self.expr(r["filter"], df))
            return df
        if "filter" in rel:
            f = rel["filter"]
            df = self.rel(f["input"])
            return df.filter(self.expr(f["condition"], df))
        if "project" in rel:
            p = rel["project"]
            df = self.rel(p["input"])
            cols = [self.expr(e, df) for e in p.get("expressions", [])]
            mapping = (
                p.get("common", {}).get("emit", {}).get("outputMapping")
            )
            if mapping:
                # output space = input fields ++ expressions; emit picks
                space = [df[c] for c in df.columns] + cols
                return df.select(*[space[i] for i in mapping])
            return df.select(*cols)
        if "fetch" in rel:
            f = rel["fetch"]
            df = self.rel(f["input"])
            if f.get("offset"):
                df = df.offset(int(f["offset"]))
            return df.limit(int(f.get("count", 0)))
        if "sort" in rel:
            s = rel["sort"]
            df = self.rel(s["input"])
            keys = []
            for sf in s.get("sorts", []):
                c = self.expr(sf["expr"], df)
                d = sf.get("direction", 2)
                keys.append(
                    c.asc_nulls_first() if d == 1
                    else c.asc_nulls_last() if d == 2
                    else c.desc_nulls_first() if d == 3
                    else c.desc_nulls_last()
                )
            return df.orderBy(*keys)
        if "aggregate" in rel:
            a = rel["aggregate"]
            df = self.rel(a["input"])
            groups = [
                self.expr(g, df)
                for g in (a.get("groupings") or [{}])[0].get(
                    "groupingExpressions", []
                )
            ]
            aggs = []
            for i, m in enumerate(a.get("measures", [])):
                fn = m["measure"]
                name = self.fn_names.get(fn.get("functionReference"), "")
                args = [
                    self.expr(arg["value"], df) for arg in fn.get("arguments", [])
                ]
                col = args[0] if args else F.lit(1)
                agg = {
                    "sum": F.sum,
                    "avg": F.avg,
                    "min": F.min,
                    "max": F.max,
                    "count": F.count,
                }.get(name)
                if agg is None:
                    raise NotImplementedError(
                        f"substrait consume: aggregate fn {name!r}"
                    )
                if name == "count" and not args:
                    col = F.lit(1)
                aggs.append(agg(col).alias(f"m{i}"))
            if aggs:
                return df.groupBy(*groups).agg(*aggs) if groups else df.agg(*aggs)
            return df.select(*groups).distinct()
        if "join" in rel:
            j = rel["join"]
            left, right = self._renamed_sides(j["left"], j["right"])
            how = {1: "inner", 2: "full", 3: "left", 4: "right"}.get(
                j.get("type", 1), "inner"
            )
            if "expression" not in j:
                return left.crossJoin(right)
            # field refs in the condition index the concatenated schema
            cond = self.expr(j["expression"], _JoinView(left, right))
            return left.join(right, on=cond, how=how)
        if "cross" in rel:
            c = rel["cross"]
            left, right = self._renamed_sides(c["left"], c["right"])
            return left.crossJoin(right)
        if "set" in rel:
            s = rel["set"]
            dfs = [self.rel(r) for r in s.get("inputs", [])]
            if s.get("op") != 7:
                raise NotImplementedError(
                    f"substrait consume: set op {s.get('op')}"
                )
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionAll(d)
            return out
        raise NotImplementedError(
            f"substrait consume: rel {sorted(rel.keys())}"
        )

    def _renamed_sides(self, left_rel: dict, right_rel: dict):
        """Positionally rename both join inputs to unique column names —
        field references are ordinal in substrait, and a self-join of the
        same table would otherwise make every reference ambiguous. The
        RelRoot names restore user-facing names at the end."""
        left, right = self.rel(left_rel), self.rel(right_rel)
        n_l = len(left.columns)
        left = left.toDF(*[f"__f{i}" for i in range(n_l)])
        right = right.toDF(*[f"__f{n_l + i}" for i in range(len(right.columns))])
        return left, right

    def expr(self, e: dict, df):
        from pyspark.sql import functions as F

        if "selection" in e:
            field = e["selection"]["directReference"]["structField"].get("field", 0)
            if isinstance(df, _JoinView):
                return df.col(field)
            return F.col(df.columns[field])
        if "literal" in e:
            lit = e["literal"]
            for k in ("boolean", "i32", "i64", "fp64", "string"):
                if k in lit:
                    return F.lit(lit[k])
            if "date" in lit:
                return F.date_add(F.lit("1970-01-01").cast("date"), lit["date"])
            raise NotImplementedError(f"substrait consume: literal {lit}")
        if "cast" in e:
            c = e["cast"]
            t = c["type"]
            spark_t = {
                "bool": "boolean",
                "i32": "int",
                "i64": "long",
                "fp64": "double",
                "string": "string",
                "date": "date",
                "timestamp": "timestamp",
            }
            key = next(iter(t.keys()))
            return self.expr(c["input"], df).cast(spark_t[key])
        if "scalarFunction" in e:
            fn = e["scalarFunction"]
            name = self.fn_names.get(fn.get("functionReference"), "")
            args = [self.expr(a["value"], df) for a in fn.get("arguments", [])]
            ops = {
                "gt": lambda a, b: a > b,
                "gte": lambda a, b: a >= b,
                "lt": lambda a, b: a < b,
                "lte": lambda a, b: a <= b,
                "equal": lambda a, b: a == b,
                "not_equal": lambda a, b: a != b,
                "and": lambda a, b: a & b,
                "or": lambda a, b: a | b,
                "not": lambda a: ~a,
                "add": lambda a, b: a + b,
                "subtract": lambda a, b: a - b,
                "multiply": lambda a, b: a * b,
                "divide": lambda a, b: a / b,
            }
            if name not in ops:
                raise NotImplementedError(f"substrait consume: function {name!r}")
            return ops[name](*args)
        raise NotImplementedError(f"substrait consume: expression {sorted(e.keys())}")


class _JoinView:
    """Field-reference resolution space for join conditions: left output
    then right output, resolved against the source frames so the join
    condition references the correct side's columns."""

    def __init__(self, left, right) -> None:
        self.left = left
        self.right = right
        self.columns = list(left.columns) + list(right.columns)

    def col(self, i: int):
        nl = len(self.left.columns)
        if i < nl:
            return self.left[self.left.columns[i]]
        return self.right[self.right.columns[i - nl]]


# --------------------------------------------------------------------------
# Public helpers used by api/substrait.py


def produce_from_sql(spark, sql: str) -> dict:
    jplan = spark.sql(sql)._jdf.queryExecution().analyzed()
    return _Producer().produce(jplan)


def produce_from_plan(plan) -> dict:
    df = getattr(plan, "_df", plan)
    sdf = getattr(df, "df", df)
    jplan = sdf._jdf.queryExecution().analyzed()
    return _Producer().produce(jplan)


def consume(spark, plan_ir: dict):
    return _Consumer(spark).consume(plan_ir)


def encode_plan(plan_ir: dict) -> bytes:
    return encode_message("Plan", plan_ir)


def decode_plan(data: bytes) -> dict:
    return decode_message("Plan", data)


_NULLABILITY_NAMES = {
    0: "NULLABILITY_UNSPECIFIED",
    1: "NULLABILITY_NULLABLE",
    2: "NULLABILITY_REQUIRED",
}
_NULLABILITY_VALUES = {v: k for k, v in _NULLABILITY_NAMES.items()}


def _jsonify(node):
    """protobuf-JSON conventions over the IR: enums by name, zero-valued
    scalar fields dropped (proto3 default omission)."""
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            if k == "nullability" and isinstance(v, int):
                out[k] = _NULLABILITY_NAMES.get(v, v)
                continue
            if k == "field" and v == 0:
                continue  # proto3 drops default-0 scalars
            out[k] = _jsonify(v)
        return out
    if isinstance(node, list):
        return [_jsonify(v) for v in node]
    return node


def _dejsonify(node):
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            if k == "nullability" and isinstance(v, str):
                out[k] = _NULLABILITY_VALUES.get(v, 0)
                continue
            out[k] = _dejsonify(v)
        return out
    if isinstance(node, list):
        return [_dejsonify(v) for v in node]
    return node


def plan_to_json(plan_ir: dict) -> str:
    return json.dumps(_jsonify(plan_ir), indent=2)


def plan_from_json(text: str) -> dict:
    return _dejsonify(json.loads(text))
