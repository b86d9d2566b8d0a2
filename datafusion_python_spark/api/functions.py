"""Function registry: the reference's functions module on PySpark.

Reference: python/datafusion/functions/__init__.py (324 fns) and
functions/spark.py (89 Spark-compat fns — 1:1 by construction). Every
function takes/returns Expr. Where Spark lacks a direct builtin the
implementation composes built-ins (still JVM-side); genuinely
unsupported surface (Arrow union type fns) raises NotImplementedError.

Aggregates honor the Expr builder state (distinct/filter/order_by —
ref expr.py:1020-1056): ``filter`` rewrites to agg(when(pred, x)),
``order_by`` on array_agg/string_agg rewrites to
sort_array(collect_list(struct(keys, value))) per SURVEY §7.3.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from .expr import CaseBuilder, Expr, SortExpr, Window, _c, to_sort_expr

_e = Expr


def _u(x: Any) -> Column:
    return _c(x)


# ---------------------------------------------------------------------------
# column / literal / misc core
def col(name: str) -> Expr:
    from .expr import _ensure_jvm

    _ensure_jvm()
    return Expr(F.col(name))


column = col


def lit(v) -> Expr:
    from .expr import lit as _lit  # single impl: handles pa.Scalar typing

    return _lit(v)


literal = lit


def alias(e, name: str, metadata: dict | None = None) -> Expr:
    src_e = e if isinstance(e, Expr) else Expr(_u(e))
    return src_e.alias(name, metadata)


def in_list(e, values: list, negated: bool = False) -> Expr:
    out = _u(e).isin([v.expr if isinstance(v, Expr) else v for v in values])
    return Expr(~out if negated else out)


def case(e) -> CaseBuilder:
    return CaseBuilder(e if isinstance(e, Expr) else Expr(_u(e)))


def when(cond, value) -> CaseBuilder:
    return CaseBuilder(None).when(cond, value)


def order_by(e, ascending: bool = True, nulls_first: bool = True) -> SortExpr:
    return SortExpr(e if isinstance(e, Expr) else Expr(_u(e)), ascending, nulls_first)


def coalesce(*es) -> Expr:
    from .expr import _expr_tag_type, _view_str_tagged
    import pyarrow as pa

    out = F.coalesce(*[_u(e) for e in es])
    # DataFusion unifies Utf8View inputs (string literals plan as views)
    if any(
        (t := _expr_tag_type(e)) is not None and pa.types.is_string_view(t)
        for e in es
    ):
        return Expr(_view_str_tagged(out, "coalesce"))
    return Expr(out)


def nullif(a, b) -> Expr:
    return Expr(F.nullif(_u(a), _u(b)))


def ifnull(a, b) -> Expr:
    from .expr import _expr_tag_type, _view_str_tagged
    import pyarrow as pa

    out = F.ifnull(_u(a), _u(b))
    if any(
        (t := _expr_tag_type(e)) is not None and pa.types.is_string_view(t)
        for e in (a, b)
    ):
        return Expr(_view_str_tagged(out, "ifnull"))
    return Expr(out)


def nvl(a, b) -> Expr:
    return Expr(F.nvl(_u(a), _u(b)))


def nvl2(a, b, c) -> Expr:
    return Expr(F.nvl2(_u(a), _u(b), _u(c)))


def nanvl(a, b) -> Expr:
    return Expr(F.nanvl(_u(a), _u(b)))


def isnan(e) -> Expr:
    # DataFusion propagates NULL; Spark's isnan(NULL) is false
    c = _u(e)
    return Expr(F.when(c.isNull(), F.lit(None).cast("boolean")).otherwise(F.isnan(c)))


def iszero(e) -> Expr:
    return Expr(_u(e) == F.lit(0))


def arrow_typeof(e) -> Expr:
    # Spark typeof emits SQL names (array<bigint>); DataFusion emits the
    # arrow DataType Debug form (List(Int64)). Static string translation
    # — order matters (bigint before int, etc.)
    c = F.typeof(_u(e))
    for old, new in (
        ("bigint", "Int64"), ("tinyint", "Int8"), ("smallint", "Int16"),
        ("int", "Int32"), ("double", "Float64"), ("float", "Float32"),
        ("string", "Utf8"), ("boolean", "Boolean"), ("binary", "Binary"),
        ("date", "Date32"),
        ("timestamp_ntz", "Timestamp(Microsecond, None)"),
        ("timestamp", 'Timestamp(Microsecond, Some("UTC"))'),
        ("array<", "List("), (">", ")"),
    ):
        c = F.replace(c, F.lit(old), F.lit(new))
    return Expr(c)


def _lit_only(value, fname: str, arg: str, default=None):
    """Literal-only argument intake (ref TestPythonicNativeTypes):
    native values pass through; a literal Expr is unwrapped with the
    reference's DeprecationWarning."""
    if isinstance(value, Expr):
        import warnings

        warnings.warn(
            f"Passing Expr for {fname}() argument {arg!r} is deprecated; "
            "pass a native Python value instead",
            DeprecationWarning,
            stacklevel=3,
        )
        v = _pystr(value)
        if v is None:
            v = _pyint(value)
        return v if v is not None else default
    return value


def _type_ref_cast(e, to, try_: bool):
    """cast-to-the-TYPE-OF-another-expression form (ref cast_to_type /
    try_cast_to_type with a type_ref column): schema-dependent, resolved
    against the enclosing frame."""
    from .expr import DeferredExpr

    src = e if isinstance(e, Expr) else Expr(_u(e))

    def build(sdf):
        dt = sdf.select(_u(to)).schema.fields[0].dataType
        c = _u(src)
        return c.try_cast(dt) if try_ else c.cast(dt)

    return DeferredExpr(build)


def _is_type_ref(to) -> bool:
    if not isinstance(to, Expr):
        return False
    try:
        to.python_value()
        return False  # a literal type NAME, not a type reference
    except Exception:
        return True


def arrow_cast(e, to) -> Expr:
    to = _lit_only(to, "arrow_cast", "data_type", "string") if isinstance(to, Expr) else to
    return (e if isinstance(e, Expr) else Expr(_u(e))).cast(to)


def cast_to_type(e, to) -> Expr:
    if _is_type_ref(to):
        return _type_ref_cast(e, to, try_=False)
    return arrow_cast(e, to)


def try_cast_to_type(e, to, _fname: str = "try_cast_to_type") -> Expr:
    if _is_type_ref(to):
        return _type_ref_cast(e, to, try_=True)
    to = _lit_only(to, _fname, "data_type", "string") if isinstance(to, Expr) else to
    return (e if isinstance(e, Expr) else Expr(_u(e))).try_cast(to)


def arrow_try_cast(e, to) -> Expr:
    return try_cast_to_type(e, to, _fname="arrow_try_cast")


def greatest(*es) -> Expr:
    return Expr(F.greatest(*[_u(e) for e in es]))


def least(*es) -> Expr:
    return Expr(F.least(*[_u(e) for e in es]))


def random() -> Expr:
    return Expr(F.rand())


def uuid() -> Expr:
    return Expr(F.expr("uuid()"))


def version() -> Expr:
    """Engine version string (ref functions/__init__.py version — the
    reference returns "Apache DataFusion <v>"; this engine reports its
    compatibility target plus the Spark build)."""
    return Expr(
        F.concat(F.lit("Apache DataFusion (Spark engine) "), F.version())
    )


def row(*es) -> Expr:
    return Expr(F.struct(*[_u(e) for e in es]))


# ---------------------------------------------------------------------------
# math (ref functions/__init__.py:941-2928 math section)

def _arrow_typed(col: Column, patype, name: str) -> Column:
    """Attach the Arrow-export restore tag (see expr._lit_scalar /
    DataFrame._restore_arrow_types) for functions whose DataFusion
    return type Spark cannot represent (u64 lengths, second-precision
    timestamps). The storage column is lossless; export casts back."""
    import base64

    import pyarrow as pa

    from .expr import ARROW_LIT_META_KEY

    tag = base64.b64encode(
        pa.schema([pa.field("t", patype)]).serialize().to_pybytes()
    ).decode()
    return col.alias(name, metadata={ARROW_LIT_META_KEY: tag})


def _m1(fn):
    def f(e) -> Expr:
        return Expr(fn(_u(e)))

    return f


abs = _m1(F.abs)  # noqa: A001
acos = _m1(F.acos)
acosh = _m1(F.acosh)
asin = _m1(F.asin)
asinh = _m1(F.asinh)
atan = _m1(F.atan)
atanh = _m1(F.atanh)
cbrt = _m1(F.cbrt)
def ceil(e) -> Expr:
    # DataFusion coerces ceil/floor to Float64; Spark returns LONG
    return Expr(F.ceil(_u(e)).cast("double"))
cos = _m1(F.cos)
cosh = _m1(F.cosh)
cot = _m1(F.cot)
degrees = _m1(F.degrees)
exp = _m1(F.exp)
factorial = _m1(F.factorial)
def floor(e) -> Expr:
    return Expr(F.floor(_u(e)).cast("double"))


def _log_df(spark_log, c):
    # DataFusion log semantics: log(0) -> -inf, log(<0) -> NaN; Spark
    # returns NULL for both. Null input stays null.
    return (
        F.when(c.isNull(), F.lit(None).cast("double"))
        .when(c == 0, F.lit(float("-inf")))
        .when(c < 0, F.lit(float("nan")))
        .otherwise(spark_log(c))
    )


def ln(e) -> Expr:
    return Expr(_log_df(F.log, _u(e)))


def log10(e) -> Expr:
    return Expr(_log_df(F.log10, _u(e)))


def log2(e) -> Expr:
    return Expr(_log_df(F.log2, _u(e)))
radians = _m1(F.radians)
signum = _m1(F.signum)
sin = _m1(F.sin)
sinh = _m1(F.sinh)
def sqrt(e) -> Expr:
    # DataFusion's sqrt errors on negative input (arrow kernel); Spark
    # returns NaN
    c = _u(e)
    return Expr(
        F.when(
            c < 0,
            F.raise_error(F.lit("cannot take square root of a negative number")),
        ).otherwise(F.sqrt(c))
    )
tan = _m1(F.tan)
tanh = _m1(F.tanh)


def atan2(y, x) -> Expr:
    return Expr(F.atan2(_u(y), _u(x)))


def gcd(a, b) -> Expr:
    aa, bb = F.abs(_u(a).cast("long")), F.abs(_u(b).cast("long"))
    # Euclid via aggregate over a bounded iteration array. Worst case for
    # 64-bit inputs is consecutive Fibonacci numbers (~F(91)) needing ~90
    # modulo steps, so bound at 92; the fold short-circuits on y==0.
    pair = F.struct(aa.alias("x"), bb.alias("y"))
    it = F.aggregate(
        F.sequence(F.lit(1), F.lit(92)),
        pair,
        lambda acc, _: F.when(
            acc["y"] == 0, acc
        ).otherwise(F.struct(acc["y"].alias("x"), (acc["x"] % acc["y"]).alias("y"))),
    )
    return Expr(it["x"])


def lcm(a, b) -> Expr:
    aa, bb = F.abs(_u(a).cast("long")), F.abs(_u(b).cast("long"))
    g = gcd(a, b).expr
    return Expr(F.when((aa == 0) | (bb == 0), F.lit(0)).otherwise(aa / g * bb).cast("long"))


def log(base, e=None) -> Expr:
    if e is None:
        return Expr(F.log(_u(base)))
    b = base if isinstance(base, (int, float)) else None
    if b is not None:
        return Expr(F.log(float(b), _u(e)))
    return Expr(F.log(_u(e)) / F.log(_u(base)))


def pi() -> Expr:
    return Expr(F.lit(3.141592653589793))


def power(base, exponent) -> Expr:
    return Expr(F.pow(_u(base), _u(exponent)))


pow = power  # noqa: A001


def round_places(decimal_places) -> int:
    if isinstance(decimal_places, Expr):
        try:
            return int(decimal_places.python_value())
        except Exception:
            return 0
    return int(decimal_places) if isinstance(decimal_places, (int, float)) else 0


def round(e, decimal_places=0) -> Expr:  # noqa: A001
    from .udf import _UdwfCall

    if isinstance(e, _UdwfCall):
        d = decimal_places
        return e.with_post(lambda c: F.round(c, round_places(d)))
    if isinstance(decimal_places, Expr):
        try:
            decimal_places = int(decimal_places.python_value())
        except Exception:
            decimal_places = 0
    places = int(decimal_places) if isinstance(decimal_places, (int, float)) else 0
    return Expr(F.round(_u(e), places))


def trunc(e, precision=0) -> Expr:
    p = precision if isinstance(precision, int) else 0
    factor = 10 ** p
    c = _u(e)
    return Expr((c * factor).cast("long") / F.lit(factor)) if p else Expr(
        c.cast("long").cast("double")
    )


# ---------------------------------------------------------------------------
# string (ref functions/__init__.py string section)
ascii = _m1(F.ascii)  # noqa: A001
bit_length = _m1(F.bit_length)
chr = _m1(F.char)  # noqa: A001


def _m1_view(fn, name):
    """Unary string kernel that DataFusion emits as Utf8View (43+
    view-native kernels) — output carries the view export tag."""
    import pyarrow as pa

    def g(e) -> Expr:
        return Expr(_arrow_typed(fn(_u(e)), pa.string_view(), name))

    g.__name__ = name
    return g


initcap = _m1_view(F.initcap, "initcap")
lower = _m1_view(F.lower, "lower")
upper = _m1_view(F.upper, "upper")
ltrim = _m1_view(F.ltrim, "ltrim")
rtrim = _m1_view(F.rtrim, "rtrim")
trim = _m1_view(F.trim, "trim")
def btrim(e) -> Expr:
    import pyarrow as pa

    # DataFusion's trim kernels emit Utf8View
    return Expr(_arrow_typed(F.trim(_u(e)), pa.string_view(), "btrim"))
def md5(e) -> Expr:
    import pyarrow as pa

    # DataFusion md5 returns a lowercase hex STRING (Utf8View) — unlike
    # sha*, which return binary digests
    return Expr(_arrow_typed(F.md5(_u(e)), pa.string_view(), "md5"))
octet_length = _m1(F.octet_length)


def reverse(e) -> Expr:
    import pyarrow as pa

    return Expr(_arrow_typed(F.reverse(_u(e)), pa.string_view(), "reverse"))
char_length = _m1(F.length)
character_length = _m1(F.length)
length = _m1(F.length)


def concat(*es) -> Expr:
    import pyarrow as pa

    # DataFusion concat SKIPS null arguments (Spark's nulls the result)
    return Expr(_arrow_typed(
        F.concat(*[F.coalesce(_u(e).cast("string"), F.lit("")) for e in es]),
        pa.string_view(),
        "concat",
    ))


def concat_ws(sep: str, *es) -> Expr:
    import pyarrow as pa

    sep = _pystr(sep, sep) if isinstance(sep, Expr) else sep
    return Expr(_arrow_typed(
        F.concat_ws(sep, *[_u(e) for e in es]), pa.string_view(), "concat_ws"
    ))


def contains(s, sub) -> Expr:
    return Expr(F.contains(_u(s), _u(sub)))


def ends_with(s, suffix) -> Expr:
    return Expr(F.endswith(_u(s), _u(suffix)))


def starts_with(s, prefix) -> Expr:
    return Expr(F.startswith(_u(s), _u(prefix)))


def find_in_set(s, str_list) -> Expr:
    return Expr(F.find_in_set(_u(s), _u(str_list)))


def instr(s, sub) -> Expr:
    return Expr(F.instr(_u(s), sub if isinstance(sub, str) else _u(sub)))


def position(s, sub) -> Expr:
    return instr(s, sub)


def strpos(s, sub) -> Expr:
    return instr(s, sub)


def left(s, n) -> Expr:
    import pyarrow as pa

    return Expr(_arrow_typed(F.left(_u(s), _u(n)), pa.string_view(), "left"))


def right(s, n) -> Expr:
    import pyarrow as pa

    return Expr(_arrow_typed(F.right(_u(s), _u(n)), pa.string_view(), "right"))


def levenshtein(a, b) -> Expr:
    return Expr(F.levenshtein(_u(a), _u(b)))


def _pystr(v, default=None):
    """Accept str | literal Expr for string-valued args."""
    if isinstance(v, Expr):
        try:
            return str(v.python_value())
        except Exception:
            return default
    return v if isinstance(v, str) else default


def _pyint(n, default=None):
    """Accept int | literal Expr for count-style args."""
    if isinstance(n, Expr):
        try:
            return int(n.python_value())
        except Exception:
            return default
    return int(n) if isinstance(n, (int, float)) else default


def lpad(s, n, pad=" ") -> Expr:
    import pyarrow as pa

    pad = pad.python_value() if isinstance(pad, Expr) else (pad if pad is not None else " ")
    # pad kernels are Utf8-returning in DataFusion (not yet view-native)
    return Expr(_arrow_typed(F.lpad(_u(s), _pyint(n, 0), pad), pa.string(), "lpad"))


def rpad(s, n, pad=" ") -> Expr:
    import pyarrow as pa

    pad = pad.python_value() if isinstance(pad, Expr) else (pad if pad is not None else " ")
    return Expr(_arrow_typed(F.rpad(_u(s), _pyint(n, 0), pad), pa.string(), "rpad"))


def overlay(s, replace_s, pos, length_n=None) -> Expr:
    import pyarrow as pa

    if length_n is None:
        out = F.overlay(_u(s), _u(replace_s), _u(pos))
    else:
        out = F.overlay(_u(s), _u(replace_s), _u(pos), _u(length_n))
    return Expr(_arrow_typed(out, pa.string(), "overlay"))


def repeat(s, n) -> Expr:
    import pyarrow as pa

    return Expr(_arrow_typed(
        F.repeat(_u(s), n if isinstance(n, int) else _u(n)),
        pa.string_view(),
        "repeat",
    ))


def replace(s, search, repl) -> Expr:
    import pyarrow as pa

    return Expr(
        _arrow_typed(F.replace(_u(s), _u(search), _u(repl)), pa.string(), "replace")
    )


def split_part(s, delim, index) -> Expr:
    import pyarrow as pa

    return Expr(_arrow_typed(
        F.split_part(_u(s), _u(delim), _u(index)), pa.string_view(), "split_part"
    ))


def substr(s, pos, length_n=None) -> Expr:
    import pyarrow as pa

    if length_n is None:
        out = F.substring(_u(s), pos if isinstance(pos, int) else _u(pos), 2147483647)
    else:
        out = F.substring(_u(s), pos if isinstance(pos, int) else _u(pos), length_n)
    return Expr(_arrow_typed(out, pa.string_view(), "substr"))


substring = substr


def substr_index(s, delim, count) -> Expr:
    return Expr(F.substring_index(_u(s), delim if isinstance(delim, str) else _u(delim), count))


substring_index = substr_index


def translate(s, from_s, to_s) -> Expr:
    import pyarrow as pa

    return Expr(_arrow_typed(
        F.translate(_u(s), _pystr(from_s, ""), _pystr(to_s, "")),
        pa.string_view(),
        "translate",
    ))


def to_hex(e) -> Expr:
    # DataFusion renders lowercase hex; Spark uppercase
    return Expr(F.lower(F.hex(_u(e))))


def encode(e, encoding: str) -> Expr:
    import pyarrow as pa

    encoding = _lit_only(encoding, "encode", "encoding", "utf-8")
    if encoding in ("base64",):
        # DataFusion emits UNPADDED base64 (arrow encode kernel), Utf8
        return Expr(_arrow_typed(
            F.regexp_replace(F.base64(_u(e)), "=+$", ""), pa.string(), "encode"
        ))
    if encoding in ("hex",):
        return Expr(F.hex(_u(e)))
    return Expr(F.encode(_u(e), encoding))


def decode(e, encoding: str) -> Expr:
    encoding = _lit_only(encoding, "decode", "encoding", "utf-8")
    if encoding in ("base64",):
        return Expr(F.unbase64(_u(e)))
    if encoding in ("hex",):
        return Expr(F.unhex(_u(e)))
    return Expr(F.decode(_u(e), encoding))


# regex
def regexp_like(s, pattern, flags=None) -> Expr:
    pat = _flagged(pattern, flags)
    return Expr(_u(s).rlike(pat) if isinstance(pat, str) else F.regexp_like(_u(s), pat))


def regexp_match(s, pattern, flags=None) -> Expr:
    import pyarrow as pa

    c = _u(s)
    arr = F.regexp_extract_all(c, F.lit(_flagged(pattern, flags)), 0)
    # DataFusion yields NULL (not an empty list) when nothing matches
    out = F.when(F.size(arr) > 0, arr)
    return Expr(
        _arrow_typed(out, pa.list_(pa.string_view()), "regexp_match")
    )


def regexp_replace(s, pattern, replacement, flags=None) -> Expr:
    pat = _flagged(pattern, flags)
    rep = replacement if isinstance(replacement, str) else _u(replacement)
    if not isinstance(pat, str):
        pat = pat if isinstance(pat, Column) else F.lit(pat)
        rep = F.lit(rep) if isinstance(rep, str) else rep
    import pyarrow as pa

    return Expr(_arrow_typed(
        F.regexp_replace(_u(s), pat, rep), pa.string_view(), "regexp_replace"
    ))


def regexp_count(s, pattern, start=None, flags=None) -> Expr:
    c = _u(s)
    st = _pyint(start, 1) or 1
    if st > 1:
        c = F.substr(c, F.lit(st))
    return Expr(F.regexp_count(c, F.lit(_flagged(pattern, flags))).cast("long"))


def regexp_instr(s, pattern, start=None, n=None, flags=None, sub_expr=None) -> Expr:
    """Position of the n-th regex match (of capture group ``sub_expr``)
    at or after ``start`` (ref functions/__init__.py:1919). Composed
    from Spark's regexp_instr over a shrinking search window: each of
    the n-1 leading matches advances the window past its full match —
    all codegen, no UDF; n/start/sub_expr accept literal ints."""
    pat = _flagged(pattern, flags)
    pat_str = pat if isinstance(pat, str) else None
    pat_l = F.lit(pat) if isinstance(pat, str) else pat
    idx = _pyint(sub_expr, 0) or 0
    st = _pyint(start, 1) or 1
    nn = _pyint(n, 1) or 1
    c = _u(s)
    frm = F.lit(st)
    # NB: max/range up here are THIS MODULE'S SQL functions — use the
    # Python builtins for the loop bound
    import builtins

    for _ in builtins.range(builtins.max(0, nn - 1)):
        sub = F.substr(c, frm)
        p = F.regexp_instr(sub, pat_l, 0)
        absp = F.when(p == 0, F.lit(0)).otherwise(p + frm - 1)
        mlen = (
            F.length(F.regexp_extract(sub, pat_str, 0))
            if pat_str is not None
            else F.lit(1)
        )
        # past-the-end sentinel when no further match exists
        frm = F.when(absp == 0, F.length(c) + 1).otherwise(absp + F.greatest(mlen, F.lit(1)))
    sub = F.substr(c, frm)
    p = F.regexp_instr(sub, pat_l, idx)
    return Expr(F.when(p == 0, F.lit(0)).otherwise(p + frm - 1).cast("long"))


def _flagged(pattern, flags):
    if isinstance(pattern, Expr):
        v = _pystr(pattern)
        if v is None:
            return pattern.expr  # dynamic pattern column; flags unsupported
        pattern = v
    if flags:
        flags = _pystr(flags, flags) or ""
        # 'g' (global) is DataFusion-only; Spark regex ops are always
        # global and reject the inline flag
        flags = flags.replace("g", "")
        return f"(?{flags}){pattern}" if flags else pattern
    return pattern


# crypto / hash
def digest(e, method) -> Expr:
    """Binary digest of the input (ref functions/__init__.py digest —
    DataFusion digests return Binary, not hex strings). blake2s/blake2b
    run hashlib and blake3 the bundled pure-Python implementation, both
    through an Arrow-batched pandas UDF (documented slow path: no JVM
    kernel exists for them)."""
    method = _lit_only(method, "digest", "method", "sha256")
    m = method if isinstance(method, str) else "sha256"
    c = _u(e)
    if m == "md5":
        return Expr(F.unhex(F.md5(c)))
    if m in ("sha224", "sha256", "sha384", "sha512"):
        return Expr(F.unhex(F.sha2(c, int(m[3:]))))
    if m == "crc32":
        return Expr(F.crc32(c))
    if m == "sha1":
        return Expr(F.unhex(F.sha1(c)))
    if m in ("blake2s", "blake2b", "blake3"):
        import pandas as _pd
        from pyspark.sql.functions import pandas_udf

        def _mk(algo):
            def _hash(s):
                import hashlib

                from datafusion_python_spark.api._blake3 import blake3 as _b3

                def one(v):
                    if v is None:
                        return None
                    b = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
                    if algo == "blake3":
                        return _b3(bytes(b))
                    return hashlib.new(algo, bytes(b)).digest()

                return s.map(one)

            # real type objects: `from __future__ import annotations`
            # would stringify inline hints and break pandas_udf's
            # signature inspection
            _hash.__annotations__ = {"s": _pd.Series, "return": _pd.Series}
            return _hash

        fn = pandas_udf(_mk(m), "binary")
        return Expr(fn(c))
    raise ValueError(f"unsupported digest method {m}")


def sha224(e) -> Expr:
    # DataFusion digest functions return BINARY digests (Spark's sha2
    # returns a hex string)
    return Expr(F.unhex(F.sha2(_u(e), 224)))


def sha256(e) -> Expr:
    return Expr(F.unhex(F.sha2(_u(e), 256)))


def sha384(e) -> Expr:
    return Expr(F.unhex(F.sha2(_u(e), 384)))


def sha512(e) -> Expr:
    return Expr(F.unhex(F.sha2(_u(e), 512)))


# ---------------------------------------------------------------------------
# datetime (ref functions/__init__.py:2345-2877)
def now() -> Expr:
    return Expr(F.current_timestamp())


current_timestamp = now


def current_date() -> Expr:
    return Expr(F.current_date())


def today() -> Expr:
    """Alias of current_date (ref functions/__init__.py today — Date32)."""
    return Expr(F.current_date())


def to_date(e, *formats) -> Expr:
    """String/timestamp → Date32; unparseable strings raise DataFusion's
    cast error (Spark's non-ANSI to_date yields NULL instead)."""
    c = _u(e)
    if formats:
        fmt = _pystr(formats[0], formats[0]) if isinstance(formats[0], Expr) else formats[0]
        parsed = F.try_to_timestamp(
            c.cast("string"), F.lit(_chrono_to_java(fmt))
        ).cast("date")
    else:
        parsed = F.try_to_timestamp(
            F.when(
                c.cast("string").rlike(r"^\s*\d{4}-\d{2}-\d{2}\s*$"),
                F.concat(c.cast("string"), F.lit(" 00:00:00")),
            ).otherwise(c.cast("string"))
        ).cast("date")
    return Expr(
        F.when(
            c.isNotNull() & parsed.isNull(),
            F.raise_error(
                F.concat(
                    F.lit("Cast error: Cannot cast string '"),
                    c.cast("string"),
                    F.lit("' to value of Date32 type"),
                )
            ).cast("date"),
        ).otherwise(parsed)
    )


def _chrono_parse_ts(c: Column, fmt) -> Column:
    """Parse a string with a chrono format into TIMESTAMP_NTZ. chrono's
    %f accepts ANY fraction width (nanoseconds, left-aligned); Java
    patterns are fixed-width — the value's fraction is normalized to
    exactly 6 digits first (sub-µs truncates: Spark timestamps are µs)."""
    fmt_s = _pystr(fmt, fmt) if isinstance(fmt, Expr) else fmt
    java = _chrono_to_java(fmt_s)
    if "%f" in str(fmt_s):
        frac = F.regexp_extract(c, r"\.(\d+)\s*$", 1)
        base = F.regexp_replace(c, r"\.\d+\s*$", "")
        c = F.when(frac == "", c).otherwise(
            F.concat(base, F.lit("."), F.rpad(F.substring(frac, 1, 6), 6, "0"))
        )
    return F.to_timestamp_ntz(c, F.lit(java))


def _ts_naive_unit(col: Column, unit: str, name: str) -> Expr:
    """NTZ storage tagged with the declared naive unit (DataFusion's
    to_timestamp family returns Timestamp(<unit>, None))."""
    import pyarrow as pa

    trunc = {
        "s": F.date_trunc("second", col).cast("timestamp_ntz"),
        "ms": F.timestamp_micros(
            (F.floor(F.unix_micros(col.cast("timestamp")) / 1000) * 1000).cast("long")
        ).cast("timestamp_ntz"),
        "us": col,
        "ns": col,
    }[unit]
    return Expr(_arrow_typed(trunc, pa.timestamp(unit), name))


def _to_ts_family(e, formats, unit: str, name: str) -> Expr:
    c = _u(e)
    iv = _pyint(e, None) if isinstance(e, Expr) else (e if isinstance(e, int) else None)
    if iv is not None and not formats:
        # integer input: an epoch count in the function's own unit
        epoch = {
            "s": F.timestamp_seconds(c.cast("long")),
            "ms": F.timestamp_millis(c.cast("long")),
            "us": F.timestamp_micros(c.cast("long")),
            "ns": F.timestamp_micros(
                F.floor(c.cast("decimal(30,0)") / 1000).cast("long")
            ),
        }[unit]
        return _ts_naive_unit(epoch.cast("timestamp_ntz"), unit, name)
    parsed = (
        _chrono_parse_ts(c, formats[0]) if formats else F.to_timestamp_ntz(c)
    )
    return _ts_naive_unit(parsed, unit, name)


def to_timestamp(e, *formats) -> Expr:
    # DataFusion to_timestamp yields Timestamp(Nanosecond, None); NTZ is
    # the µs storage (exact under the pinned UTC session), tagged ns
    return _to_ts_family(e, formats, "ns", "to_timestamp")


def to_timestamp_seconds(e, *formats) -> Expr:
    return _to_ts_family(e, formats, "s", "to_timestamp_seconds")


def to_timestamp_millis(e, *formats) -> Expr:
    return _to_ts_family(e, formats, "ms", "to_timestamp_millis")


def to_timestamp_micros(e, *formats) -> Expr:
    return _to_ts_family(e, formats, "us", "to_timestamp_micros")


def to_timestamp_nanos(e, *formats) -> Expr:
    # Spark timestamps are µs; sub-µs input truncates (documented)
    return _to_ts_family(e, formats, "ns", "to_timestamp_nanos")


def to_unixtime(e) -> Expr:
    return Expr(F.unix_timestamp(_u(e)))


def from_unixtime(e) -> Expr:
    # DataFusion returns Timestamp(Second, None)
    import pyarrow as pa

    return Expr(
        _arrow_typed(
            F.timestamp_seconds(_u(e).cast("long")).cast("timestamp_ntz"),
            pa.timestamp("s"),
            "from_unixtime",
        )
    )


def date_part(part, e, _fname: str = "date_part") -> Expr:
    part = _lit_only(part, _fname, "part", "year")
    p = part if isinstance(part, str) else "year"
    return Expr(F.date_part(F.lit(p), _u(e)))


def datepart(part, e) -> Expr:
    return date_part(part, e, _fname="datepart")


def extract(part, e) -> Expr:
    return date_part(part, e, _fname="extract")


def date_trunc(part, e, _fname: str = "date_trunc") -> Expr:
    """Truncate to a calendar unit. DataFusion's output naive-ness
    follows the input (naive in → naive out); Spark's date_trunc always
    yields an instant TIMESTAMP, so the output type is resolved against
    the frame's schema when used in a select."""
    from .expr import DeferredExpr

    part = _lit_only(part, _fname, "part", "day")
    p = part if isinstance(part, str) else "day"
    src = _u(e)
    default = F.date_trunc(p, src)

    def build(sdf):
        from pyspark.sql import types as T

        try:
            dt = sdf.select(src).schema.fields[0].dataType
        except Exception:
            return default
        if isinstance(dt, (T.TimestampNTZType, T.StringType, T.DateType)):
            return default.cast("timestamp_ntz")
        return default

    return DeferredExpr(build, default)


def datetrunc(part, e) -> Expr:
    return date_trunc(part, e, _fname="datetrunc")


def date_bin(stride, source, origin=None) -> Expr:
    """Fixed-stride time bucketing (ref functions/__init__.py:2788).

    stride: Expr wrapping an interval literal or a string like
    '15 minutes'. Implemented with epoch arithmetic (codegen-friendly),
    matching DataFusion's origin-aligned semantics.
    """
    import re as _re

    if isinstance(stride, Expr):
        s = _pystr(stride)
        if s is None:
            raise TypeError("date_bin stride must be a string like '15 minutes'")
        stride = s
    if isinstance(stride, str):
        m = _re.match(r"(\d+)\s*(\w+)", stride)
        qty, unit = int(m.group(1)), m.group(2).rstrip("s")
        fixed = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}
        if unit in ("month", "year"):
            return _date_bin_months(qty * (12 if unit == "year" else 1), source, origin)
        if unit not in fixed:
            raise NotImplementedError(f"date_bin stride unit {unit!r}")
        secs = fixed[unit] * qty
    else:
        raise TypeError("date_bin stride must be a string like '15 minutes'")
    src = F.unix_timestamp(_u(source))
    org = F.unix_timestamp(_u(origin)) if origin is not None else F.lit(0)
    # floor, not truncate-toward-zero: sources before the origin must bin
    # to the stride boundary at-or-below them (DataFusion floor semantics)
    binned = org + F.floor((src - org) / secs).cast("long") * secs
    import pyarrow as pa

    # DataFusion date_bin returns Timestamp(Nanosecond, tz-of-input)
    return Expr(
        _arrow_typed(
            F.timestamp_seconds(binned), pa.timestamp("ns", "UTC"), "date_bin"
        )
    )


def _date_bin_months(qty: int, source, origin) -> Expr:
    """Calendar-length date_bin strides (N months / years): bins are
    ``origin + k*qty months`` and a source maps to the largest such bin
    at-or-below it (DataFusion's datetime_expressions date_bin month
    semantics, floor toward the past). Month-end days clamp the way
    interval arithmetic does in both engines (Jan 31 + 1 month = end of
    February). All-builtin column math — no UDF."""
    src = _u(source)
    org = _u(origin) if origin is not None else F.lit("1970-01-01").cast("timestamp")
    # whole calendar months between, ignoring day-of-month ...
    k = (F.year(src) - F.year(org)) * 12 + (F.month(src) - F.month(org))
    n = F.floor(k / F.lit(qty)).cast("int") * qty
    zero = F.lit(0)

    def shift(months):
        return org + F.make_interval(zero, months, zero, zero, zero, zero, F.lit(0.0))

    b = shift(n)
    # ... then step one stride back when day/time-of-month puts the
    # candidate bin start after the source
    return Expr(F.when(src < b, shift(n - qty)).otherwise(b))


def make_date(y, m, d) -> Expr:
    return Expr(F.make_date(_u(y), _u(m), _u(d)))


def to_char(e, fmt) -> Expr:
    fmt = _pystr(fmt, "%Y-%m-%d") if isinstance(fmt, Expr) else fmt
    return Expr(F.date_format(_u(e), _chrono_to_java(fmt)))


def arrow_field(e) -> Expr:
    """Arrow field descriptor of the expression (ref
    functions/__init__.py:3150): struct of name / data_type (Rust Debug
    name) / nullable / metadata. Schema-dependent — resolved against the
    enclosing frame when used in a select."""
    from .expr import DeferredExpr

    src = e if isinstance(e, Expr) else Expr(_u(e))

    def build(sdf):
        from .dataframe import DataFrame as _DF

        sel = _DF(sdf.select(_u(src)))
        fld = sel.schema().field(0)
        md = {
            (k.decode() if isinstance(k, bytes) else str(k)):
            (v.decode() if isinstance(v, bytes) else str(v))
            for k, v in (fld.metadata or {}).items()
        }
        meta_col = (
            F.create_map(*[x for k, v in md.items() for x in (F.lit(k), F.lit(v))])
            if md
            else F.lit(None).cast("map<string,string>")
        )
        return F.struct(
            F.lit(fld.name).alias("name"),
            F.lit(_rust_type_name(fld.type)).alias("data_type"),
            F.lit(bool(fld.nullable)).alias("nullable"),
            meta_col.alias("metadata"),
        )

    return DeferredExpr(build)


def _rust_type_name(t) -> str:
    """Arrow DataType in Rust Debug form ("Int64", "Utf8", ...)."""
    import pyarrow as pa

    table = {
        "int8": "Int8", "int16": "Int16", "int32": "Int32", "int64": "Int64",
        "uint8": "UInt8", "uint16": "UInt16", "uint32": "UInt32",
        "uint64": "UInt64", "float": "Float32", "halffloat": "Float16",
        "double": "Float64", "string": "Utf8", "large_string": "LargeUtf8",
        "string_view": "Utf8View", "binary": "Binary", "bool": "Boolean",
        "date32[day]": "Date32", "date64[ms]": "Date64",
    }
    key = str(t)
    if key in table:
        return table[key]
    if pa.types.is_list(t):
        return f"List({_rust_type_name(t.value_type)})"
    if pa.types.is_timestamp(t):
        unit = {"s": "Second", "ms": "Millisecond", "us": "Microsecond", "ns": "Nanosecond"}[t.unit]
        tz = f'Some("{t.tz}")' if t.tz else "None"
        return f"Timestamp({unit}, {tz})"
    return key


date_format = to_char


_CHRONO_MAP = [
    ("%Y", "yyyy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%y", "yy"),
    ("%B", "MMMM"),
    ("%b", "MMM"),
    ("%A", "EEEE"),
    ("%a", "EEE"),
    ("%j", "DDD"),
    ("%f", "SSSSSS"),
]


def _chrono_to_java(fmt: str) -> str:
    """Chrono strftime-style → Java DateTimeFormatter (SURVEY §2.8
    hazard). Literal letters between directives are quoted ('h' etc. are
    pattern letters to Java but plain text to chrono)."""
    if "%" not in fmt:
        return fmt
    import re as _re

    out: list[str] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            for chrono, java in _CHRONO_MAP:
                if chrono == tok:
                    out.append(java)
                    break
            else:
                out.append(tok[1])
            i += 2
            continue
        m = _re.match(r"[A-Za-z]+", fmt[i:])
        if m:
            out.append(f"'{m.group(0)}'")
            i += m.end()
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# aggregates — honor Expr builder state (distinct/filter/order_by)
def _agg_input(e) -> tuple[Column, dict]:
    if isinstance(e, SortExpr):
        # DataFusion lets a SortExpr be the aggregate input to convey
        # ordering (e.g. t-digest build order); the value column is its
        # inner expression
        c, state = _agg_input(e.inner)
        state["order_by"] = [e]
        return c, state
    if isinstance(e, Expr):
        state = {
            "distinct": e._distinct,
            "filter": e._filter,
            "order_by": e._order_by,
            "null_treatment": e._null_treatment,
        }
        return e.expr, state
    return _u(e), {"distinct": False, "filter": None, "order_by": None, "null_treatment": None}


def _ignore_nulls(null_treatment, state: dict) -> bool:
    """True when nulls should be ignored. Accepts the string forms and
    the common.NullTreatment enum (ref NullTreatment.IGNORE_NULLS)."""
    v = null_treatment if null_treatment is not None else state["null_treatment"]
    if v is None:
        return False
    v = getattr(v, "value", v)
    return str(v).lower().startswith("ignore")


def _ob(order_by, state: dict):
    """Resolve the effective order_by: explicit kwarg wins over builder
    state; a bare Expr/SortExpr is accepted like a one-element list
    (ref signatures take ``Expr | SortExpr | list``)."""
    ob = order_by if order_by is not None else state["order_by"]
    if ob is None:
        return None
    if isinstance(ob, (list, tuple)):
        return list(ob) or None
    return [ob]


def _filtered(c: Column, state: dict) -> Column:
    if state["filter"] is not None:
        return F.when(state["filter"], c)
    return c


def _mk_agg(base_fn, distinct_fn=None):
    def agg(e, distinct: bool = False, filter=None, order_by=None, null_treatment=None) -> Expr:
        c, state = _agg_input(e)
        if distinct:
            state["distinct"] = True
        if filter is not None:
            state["filter"] = _u(filter)
        c = _filtered(c, state)
        if state["distinct"]:
            if distinct_fn is None:
                raise NotImplementedError("DISTINCT not supported for this aggregate")
            return Expr(distinct_fn(c))
        return Expr(base_fn(c))

    return agg


def _median_distinct(c: Column) -> Column:
    # exact DISTINCT median: sorted set, middle element (avg of the two
    # middles for even cardinality) — float64 like DataFusion's
    arr = F.array_sort(F.collect_set(c))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int")).cast("double")
    hi = F.element_at(arr, (n / 2 + 1).cast("int")).cast("double")
    return (lo + hi) / 2


sum = _mk_agg(F.sum, F.sum_distinct)  # noqa: A001
# DISTINCT is a no-op for order/bool/bitwise-idempotent aggregates
min = _mk_agg(F.min, F.min)  # noqa: A001
max = _mk_agg(F.max, F.max)  # noqa: A001
avg = _mk_agg(F.avg, lambda c: F.sum_distinct(c) / F.count_distinct(c))
mean = avg
median = _mk_agg(F.median, _median_distinct)
_count_agg = _mk_agg(F.count, F.count_distinct)


def count(e=None, distinct: bool = False, filter=None, order_by=None, null_treatment=None) -> Expr:
    if e is None:  # bare count() counts rows (ref count(expr=None) -> COUNT(1))
        e = Expr(F.lit(1))
    return _count_agg(e, distinct=distinct, filter=filter, order_by=order_by, null_treatment=null_treatment)
stddev = _mk_agg(F.stddev)
stddev_pop = _mk_agg(F.stddev_pop)
stddev_samp = _mk_agg(F.stddev_samp)
var = _mk_agg(F.var_samp)
var_pop = _mk_agg(F.var_pop)
var_samp = _mk_agg(F.var_samp)
bit_and = _mk_agg(F.bit_and, F.bit_and)
bit_or = _mk_agg(F.bit_or, F.bit_or)
bit_xor = _mk_agg(
    F.bit_xor,
    lambda c: F.aggregate(
        F.collect_set(c), F.lit(0).cast("long"), lambda a, x: a.bitwiseXOR(x.cast("long"))
    ),
)
bool_and = _mk_agg(F.bool_and, F.bool_and)
bool_or = _mk_agg(F.bool_or, F.bool_or)
# DataFusion's approx_median is a default-size t-digest, which
# interpolates between values; Spark's percentile_approx picks a real
# element (lower). The exact interpolating percentile matches the
# t-digest estimate on anything the approximation is judged against.
approx_median = _mk_agg(lambda c: F.percentile(c, F.lit(0.5)).cast("double"))


def _uint64_agg(col: Column, name: str) -> Expr:
    import pyarrow as pa

    return Expr(_arrow_typed(col, pa.uint64(), name))


approx_distinct = _mk_agg(
    lambda c: _uint64_agg(F.approx_count_distinct(c), "approx_distinct").expr
)


def count_star(filter=None) -> Expr:
    if filter is not None:
        return Expr(F.count(F.when(_u(filter), F.lit(1))))
    return Expr(F.count(F.lit(1)))


def _mk_agg2(base_fn):
    # two-column aggregates with the standard builder kwargs; ``filter``
    # masks BOTH inputs (ref: AggregateExprBuilder filter applies to the
    # whole aggregate row)
    def agg(a, b, distinct: bool = False, filter=None, null_treatment=None) -> Expr:
        ca, cb = _u(a), _u(b)
        if filter is not None:
            pred = _u(filter)
            ca, cb = F.when(pred, ca), F.when(pred, cb)
        return Expr(base_fn(ca, cb))

    return agg


covar = _mk_agg2(F.covar_samp)
covar_samp = _mk_agg2(F.covar_samp)
covar_pop = _mk_agg2(F.covar_pop)
corr = _mk_agg2(F.corr)
regr_avgx = _mk_agg2(F.regr_avgx)
regr_avgy = _mk_agg2(F.regr_avgy)
regr_count = _mk_agg2(F.regr_count)
regr_intercept = _mk_agg2(F.regr_intercept)
regr_r2 = _mk_agg2(F.regr_r2)
regr_slope = _mk_agg2(F.regr_slope)
regr_sxx = _mk_agg2(F.regr_sxx)
regr_sxy = _mk_agg2(F.regr_sxy)
regr_syy = _mk_agg2(F.regr_syy)


def approx_percentile_cont(
    e, percentile: float, num_centroids: int | None = None, filter=None
) -> Expr:
    c, state = _agg_input(e)
    if filter is not None:
        state["filter"] = _u(filter)
    c = _filtered(c, state)
    if num_centroids is not None:
        # an explicit digest size makes the approximation SHAPE
        # observable — run a faithful folly-style merging t-digest
        # (the algorithm DataFusion's tdigest implements) in an
        # Arrow-batched pandas aggregate
        import pandas as _pd
        from pyspark.sql.functions import PandasUDFType, pandas_udf

        pct = float(percentile)
        size = int(num_centroids)

        def td(v):
            from datafusion_python_spark.api._tdigest import tdigest_quantile

            return tdigest_quantile([x for x in v if x is not None], pct, size)

        td.__annotations__ = {"v": _pd.Series, "return": float}
        fn = pandas_udf(td, "double", PandasUDFType.GROUPED_AGG)
        return Expr(fn(c.cast("double")))
    # default digest: the exact interpolating percentile (JVM-native),
    # which is what the t-digest converges to
    return Expr(F.percentile(c, F.lit(float(percentile))).cast("double"))


def percentile_cont(e, percentile: float, filter=None) -> Expr:
    c, state = _agg_input(e)
    if filter is not None:
        state["filter"] = _u(filter)
    c = _filtered(c, state)
    return Expr(F.percentile(c, F.lit(percentile)))


quantile_cont = percentile_cont


def grouping(e) -> Expr:
    return Expr(F.grouping(_u(e)))


def _kept_structs(c: Column, pred: Column | None, ignore: bool) -> Column:
    """collect_list of single-field structs with FILTER/IGNORE NULLS
    applied by dropping rows (null structs), preserving genuine null
    values under RESPECT NULLS."""
    cond = c.isNotNull() if ignore else None
    if pred is not None:
        cond = pred if cond is None else (pred & cond)
    s = F.struct(c.alias("v"))
    if cond is not None:
        s = F.when(cond, s)
    return F.collect_list(s)


def _defer_over(out: Expr, native: Column, extra_order=None, stable: bool = False) -> Expr:
    """Attach a window re-binder: ``expr.over(Window(...))`` rebuilds the
    NATIVE windowed form (F.first/F.last/F.nth_value/...) inside the
    window spec instead of windowing the aggregate-context composition."""

    def over_fn(window):
        w2 = Window(
            partition_by=window.partition_by,
            window_frame=window.window_frame,
            order_by=(list(extra_order or []) or list(window.order_by)) or None,
            null_treatment=window.null_treatment,
        )
        return Expr(native.over(w2._to_spark()))

    out._over_fn = over_fn
    return out


def first_value(e, filter=None, order_by=None, null_treatment=None) -> Expr:
    c, state = _agg_input(e)
    if filter is not None:
        state["filter"] = _u(filter)
    pred = state["filter"]
    ob = _ob(order_by, state)
    ignore = _ignore_nulls(null_treatment, state)
    if ob:
        out = Expr(_ordered_values(c, ob, skip_null_values=ignore, pred=pred)[0]["v"])
    elif pred is not None:
        out = Expr(F.element_at(_kept_structs(c, pred, ignore), 1)["v"])
    else:
        out = Expr(F.first(c, ignorenulls=ignore))
    if pred is None:
        _defer_over(out, F.first(c, ignorenulls=ignore), extra_order=ob)
    return out


def last_value(e, filter=None, order_by=None, null_treatment=None) -> Expr:
    c, state = _agg_input(e)
    if filter is not None:
        state["filter"] = _u(filter)
    pred = state["filter"]
    ob = _ob(order_by, state)
    ignore = _ignore_nulls(null_treatment, state)
    if ob:
        lst = _ordered_values(c, ob, skip_null_values=ignore, pred=pred)
        out = Expr(F.element_at(lst, F.size(lst))["v"])
    elif pred is not None:
        lst = _kept_structs(c, pred, ignore)
        out = Expr(F.element_at(lst, F.size(lst))["v"])
    else:
        out = Expr(F.last(c, ignorenulls=ignore))
    if pred is None:
        _defer_over(out, F.last(c, ignorenulls=ignore), extra_order=ob)
    return out


def nth_value(e, n: int, filter=None, order_by=None, null_treatment=None) -> Expr:
    c, state = _agg_input(e)
    if filter is not None:
        state["filter"] = _u(filter)
    pred = state["filter"]
    ignore = _ignore_nulls(null_treatment, state)
    ob = _ob(order_by, state)
    if ob:
        out = Expr(
            F.element_at(_ordered_values(c, ob, skip_null_values=ignore, pred=pred), n)["v"]
        )
    else:
        out = Expr(F.element_at(_kept_structs(c, pred, ignore), n)["v"])
    if pred is None:
        _defer_over(out, F.nth_value(c, n, ignoreNulls=ignore), extra_order=ob)
    return out


def _ordered_values(
    c: Column, order_by_keys, skip_null_values: bool = False, pred: Column | None = None
) -> Column:
    """Collect ``(keys…, value)`` structs and sort by the keys with an
    explicit comparator honoring per-key direction and null placement.

    Works for ANY orderable key type (strings, dates, timestamps) in any
    direction — unlike unary-minus negation, which only works on numerics.
    Runs inside codegen (higher-order array_sort), one aggregation state
    per group — scale behavior identical to collect_list.

    ``pred`` (the aggregate FILTER clause) drops rows entirely — unlike
    null-masking the value, which would surface as a null element under
    RESPECT NULLS.
    """
    keys = [to_sort_expr(k) for k in order_by_keys]
    fields = [k.inner.expr.alias(f"k{i}") for i, k in enumerate(keys)]
    fields.append(c.alias("v"))
    pairs = F.struct(*fields)
    cond = c.isNotNull() if skip_null_values else None
    if pred is not None:
        cond = pred if cond is None else (pred & cond)
    if cond is not None:
        # a null struct is dropped by collect_list — this is how IGNORE
        # NULLS / FILTER remove rows (a struct with a null field is NOT null)
        pairs = F.when(cond, pairs)

    def cmp(left: Column, right: Column) -> Column:
        res = F.lit(0)
        for i, k in reversed(list(enumerate(keys))):
            lk, rk = left[f"k{i}"], right[f"k{i}"]
            lt, gt = (F.lit(-1), F.lit(1)) if k.ascending else (F.lit(1), F.lit(-1))
            nf = F.lit(-1) if k.nulls_first else F.lit(1)
            res = (
                F.when(lk.isNull() & rk.isNull(), res)
                .when(lk.isNull(), nf)
                .when(rk.isNull(), -nf)
                .when(lk < rk, lt)
                .when(lk > rk, gt)
                .otherwise(res)
            )
        return res

    return F.array_sort(F.collect_list(pairs), cmp)


def array_agg(e, distinct: bool = False, filter=None, order_by=None, null_treatment=None) -> Expr:
    """DataFusion semantics (ref functions/__init__.py:872): nulls are KEPT
    unless null_treatment ignores them. Spark's collect_list always drops
    nulls, so the respect-nulls path collects single-field structs (never
    null themselves) and unwraps — same state size, still codegen."""
    c, state = _agg_input(e)
    if filter is not None:
        state["filter"] = _u(filter)
    pred = state["filter"]
    ignore = _ignore_nulls(null_treatment, state)
    ob = _ob(order_by, state)
    if ob:
        return Expr(
            F.transform(
                _ordered_values(c, ob, skip_null_values=ignore, pred=pred),
                lambda s: s["v"],
            )
        )
    if distinct or state["distinct"]:
        # set semantics: nulls excluded (documented); masking is safe here
        return Expr(F.collect_set(_filtered(c, state)))
    if ignore:
        return Expr(F.collect_list(_filtered(c, state)))
    return Expr(F.transform(_kept_structs(c, pred, False), lambda s: s["v"]))


def string_agg(e, delimiter: str = ",", filter=None, order_by=None) -> Expr:
    c, state = _agg_input(e)
    if filter is not None:
        state["filter"] = _u(filter)
    pred = state["filter"]
    ob = _ob(order_by, state)
    if ob:
        return Expr(
            F.array_join(
                F.transform(_ordered_values(c, ob, pred=pred), lambda s: s["v"]),
                delimiter,
            )
        )
    return Expr(F.array_join(F.collect_list(_filtered(c, state)), delimiter))


# ---------------------------------------------------------------------------
# window functions (ref functions/__init__.py:6553-7053) — partition_by /
# order_by kwargs build the OVER clause, like the reference
def _pcol(p) -> Column:
    # partition keys: a string names a column (not a literal)
    return F.col(p) if isinstance(p, str) else _u(p)


def _win(col: Column, partition_by, order_by_keys, stable: bool = False) -> Column:
    from pyspark.sql import Window as W

    # bare Expr/SortExpr accepted like one-element lists (ref signatures)
    parts = partition_by if isinstance(partition_by, (list, tuple)) else (
        [] if partition_by is None else [partition_by]
    )
    keys = order_by_keys if isinstance(order_by_keys, (list, tuple)) else (
        [] if order_by_keys is None else [order_by_keys]
    )
    spec = W.partitionBy(*[_pcol(p) for p in parts])
    if keys:
        sort_cols = [to_sort_expr(k)._to_spark() for k in keys]
        if stable:
            # DataFusion breaks order-key ties by input order (stable
            # window sort); pin it with a per-row monotonic id so
            # positional functions (row_number/ntile/lead/lag) match
            sort_cols.append(F.monotonically_increasing_id().asc())
        spec = spec.orderBy(*sort_cols)
    return col.over(spec)


def row_number(partition_by=None, order_by=None) -> Expr:
    return Expr(_win(F.row_number(), partition_by, order_by, stable=True))


def rank(partition_by=None, order_by=None) -> Expr:
    return Expr(_win(F.rank(), partition_by, order_by))


def dense_rank(partition_by=None, order_by=None) -> Expr:
    return Expr(_win(F.dense_rank(), partition_by, order_by))


def percent_rank(partition_by=None, order_by=None) -> Expr:
    return Expr(_win(F.percent_rank(), partition_by, order_by))


def cume_dist(partition_by=None, order_by=None) -> Expr:
    return Expr(_win(F.cume_dist(), partition_by, order_by))


def ntile(n: int, partition_by=None, order_by=None) -> Expr:
    return Expr(_win(F.ntile(n), partition_by, order_by, stable=True))


def lead(e, shift_offset: int = 1, default_value=None, partition_by=None, order_by=None) -> Expr:
    c = F.lead(_u(e), shift_offset, default_value)
    return Expr(_win(c, partition_by, order_by, stable=True))


def lag(e, shift_offset: int = 1, default_value=None, partition_by=None, order_by=None) -> Expr:
    c = F.lag(_u(e), shift_offset, default_value)
    return Expr(_win(c, partition_by, order_by, stable=True))


# ---------------------------------------------------------------------------
# arrays (ref functions/__init__.py:2941-4925) — list_* aliases included
def make_array(*es) -> Expr:
    return Expr(F.array(*[_u(e) for e in es]))


array = make_array


def array_append(arr, v) -> Expr:
    return Expr(F.array_append(_u(arr), _u(v)))


def array_prepend(v, arr) -> Expr:
    return Expr(F.array_prepend(_u(arr), _u(v)))


def array_concat(*arrs) -> Expr:
    return Expr(F.concat(*[_u(a) for a in arrs]))


array_cat = array_concat


def array_distinct(arr) -> Expr:
    return Expr(F.array_distinct(_u(arr)))


def array_compact(arr) -> Expr:
    return Expr(F.array_compact(_u(arr)))


def array_element(arr, i) -> Expr:
    # Spark element_at requires an INT index (lit ints are Int64);
    # try_element_at: DataFusion returns NULL out of bounds, ANSI raises
    iv = _pyint(i, None)
    ix = F.lit(iv).cast("int") if isinstance(iv, int) else _u(i).cast("int")
    return Expr(F.try_element_at(_u(arr), ix))


array_extract = array_element


def element_at(m, key) -> Expr:
    """Alias of map_extract (ref functions/__init__.py element_at — the
    reference's element_at is the MAP accessor returning a 1-element
    list; arrays use array_element)."""
    return map_extract(m, key)


def array_empty(arr) -> Expr:
    return Expr(F.size(_u(arr)) == 0)


empty = array_empty


def array_length(arr) -> Expr:
    import pyarrow as pa

    return Expr(_arrow_typed(F.size(_u(arr)).cast("long"), pa.uint64(), "array_length"))


list_length = array_length
cardinality = array_length


def array_has(arr, v) -> Expr:
    return Expr(F.array_contains(_u(arr), _u(v)))


def array_has_all(arr, sub) -> Expr:
    a, s = _u(arr), _u(sub)
    return Expr(F.size(F.array_except(s, a)) == 0)


def array_has_any(arr, other) -> Expr:
    return Expr(F.arrays_overlap(_u(arr), _u(other)))


arrays_overlap = array_has_any


def array_position(arr, v, start=None) -> Expr:
    """1-based position of the first match; NULL when absent (DataFusion
    semantics — Spark's array_position returns 0). Optional ``start``
    searches from that 1-based index."""
    a = _u(arr)
    if start is not None:
        st = _pyint(start, 1) or 1
        p = F.array_position(F.slice(a, st, F.size(a)), _u(v))
        pos = F.when(p > 0, (p + F.lit(st - 1)).cast("long"))
        return Expr(pos)
    p = F.array_position(a, _u(v))
    return Expr(F.when(p > 0, p.cast("long")))


array_indexof = array_position


def array_positions(arr, v) -> Expr:
    a, vv = _u(arr), _u(v)
    idx = F.sequence(F.lit(1), F.size(a))
    return Expr(F.filter(idx, lambda i: F.element_at(a, i) == vv).cast("array<bigint>"))


def array_remove_n(arr, v, n) -> Expr:
    """Remove the first ``n`` elements equal to ``v`` (ref functions/__init__.py:4149).

    Spark has no direct equivalent (F.array_remove drops ALL matches), so the
    first-n positions of ``v`` are computed and index-filtered out — pure
    built-in higher-order functions, no Python UDF.
    """
    a, vv = _u(arr), _u(v)
    nn = F.lit(n) if isinstance(n, int) else _u(n)
    idx = F.sequence(F.lit(1), F.size(a))
    pos = F.filter(idx, lambda i: F.element_at(a, i) == vv)
    drop = F.slice(pos, F.lit(1), F.greatest(F.least(nn, F.size(pos)), F.lit(0)))
    kept = F.filter(idx, lambda i: ~F.array_contains(drop, i))
    return Expr(F.when(a.isNotNull(), F.transform(kept, lambda i: F.element_at(a, i))))


def array_remove(arr, v) -> Expr:
    """Remove the FIRST element equal to ``v`` (ref functions/__init__.py:4126).

    Note: Spark's own F.array_remove removes ALL occurrences — that is
    DataFusion's array_remove_all; this removes only the first match.
    """
    return array_remove_n(arr, v, 1)


def array_remove_all(arr, v) -> Expr:
    return Expr(F.array_remove(_u(arr), _u(v)))


def array_repeat(v, n) -> Expr:
    return Expr(F.array_repeat(_u(v), n if isinstance(n, int) else _u(n).cast("int")))


def array_replace(arr, from_v, to_v) -> Expr:
    """Replace the FIRST occurrence (ref array_replace). Indexed
    transform — arrays_zip is avoided because its struct field names
    follow the input expression names."""
    a = _u(arr)
    fv, tv = _u(from_v), _u(to_v)
    found = F.array_position(a, fv)
    return Expr(
        F.transform(a, lambda x, i: F.when(i + 1 == found, tv).otherwise(x))
    )


def array_replace_all(arr, from_v, to_v) -> Expr:
    a, fv, tv = _u(arr), _u(from_v), _u(to_v)
    return Expr(F.transform(a, lambda x: F.when(x == fv, tv).otherwise(x)))


def array_pop_back(arr) -> Expr:
    a = _u(arr)
    return Expr(F.slice(a, 1, F.greatest(F.size(a) - 1, F.lit(0))))


def array_pop_front(arr) -> Expr:
    a = _u(arr)
    return Expr(F.slice(a, 2, F.greatest(F.size(a) - 1, F.lit(0))))


def array_sort(arr, descending: bool = False, null_first: bool = False) -> Expr:
    a = _u(arr)
    if not descending:
        return Expr(F.array_sort(a))
    return Expr(F.reverse(F.array_sort(a)))


list_sort = array_sort
sort = array_sort


def array_slice(arr, begin, end, stride=None) -> Expr:
    """DataFusion array_slice: 1-based INCLUSIVE bounds, negative counts
    from the end (-1 = last), optional stride (ref
    functions/__init__.py array_slice). Column-safe: built from
    sequence + element_at so bounds/stride may be expressions."""
    a = _u(arr)

    def norm(v):
        c = _u(v).cast("int") if not isinstance(v, int) else F.lit(v).cast("int")
        return F.when(c < 0, F.size(a) + c + 1).otherwise(c)

    b = norm(begin)
    e = F.least(norm(end), F.size(a))
    st = (
        F.lit(1).cast("int")
        if stride is None
        else (_u(stride).cast("int") if not isinstance(stride, int) else F.lit(stride).cast("int"))
    )
    idxs = F.when(b <= e, F.sequence(b, e, st)).otherwise(
        F.array().cast("array<int>")
    )
    valid = F.filter(idxs, lambda i: (i >= 1) & (i <= F.size(a)))
    return Expr(F.transform(valid, lambda i: F.element_at(a, i)))


def array_intersect(a, b) -> Expr:
    return Expr(F.array_intersect(_u(a), _u(b)))


def array_union(a, b) -> Expr:
    return Expr(F.array_union(_u(a), _u(b)))


def array_except(a, b) -> Expr:
    return Expr(F.array_except(_u(a), _u(b)))


def array_resize(arr, size, value=None) -> Expr:
    a, n = _u(arr), _u(size)
    pad = F.array_repeat(_u(value) if value is not None else F.lit(None), F.greatest(n - F.size(a), F.lit(0)).cast("int"))
    return Expr(F.slice(F.concat(a, pad), 1, n.cast("int")))


def array_any_value(arr) -> Expr:
    # NULL (not an error) for empty/all-null arrays
    a = _u(arr)
    return Expr(F.try_element_at(F.array_compact(a), F.lit(1)))


def array_max(arr) -> Expr:
    return Expr(F.array_max(_u(arr)))


def array_min(arr) -> Expr:
    return Expr(F.array_min(_u(arr)))


def array_reverse(arr) -> Expr:
    return Expr(F.reverse(_u(arr)))


def arrays_zip(*arrs) -> Expr:
    """Element-wise zip; DataFusion names the struct fields 1..n (Spark
    uses the input column names) — rebuilt with named_struct."""
    import builtins

    cols = [_u(a) for a in arrs]
    n = builtins.len(cols)
    sz = F.greatest(*[F.size(c) for c in cols]) if n > 1 else F.size(cols[0])
    idxs = F.sequence(F.lit(1), F.greatest(sz, F.lit(0)))
    return Expr(F.transform(idxs, lambda i: F.named_struct(*[
        x for j, c in builtins.enumerate(cols)
        for x in (F.lit(str(j + 1)), F.try_element_at(c, i))
    ])))


def array_dims(arr) -> Expr:
    # DataFusion: dims of an EMPTY (or null) list is NULL; nested lists
    # report [outer, inner] — u64 elements. The inner size must stay
    # STATICALLY type-safe for 1-D inputs, so the nested branch measures
    # the first element through its string form (never taken at runtime
    # for 1-D arrays; analysis-legal for both).
    import pyarrow as pa

    a = _u(arr)
    inner_s = F.element_at(a, 1).cast("string")
    inner_body = F.regexp_replace(inner_s, r"^\[|\]$", "")
    inner_size = F.when(inner_body == "", F.lit(0)).otherwise(
        F.size(F.split(inner_body, ","))
    )
    dims = F.when(a.isNull() | (F.size(a) == 0), F.lit(None).cast("array<long>")).when(
        F.typeof(a).like("array<array%"),
        F.array(F.size(a).cast("long"), inner_size.cast("long")),
    ).otherwise(F.array(F.size(a).cast("long")))
    return Expr(_arrow_typed(dims, pa.list_(pa.uint64()), "array_dims"))


def array_ndims(arr) -> Expr:
    import pyarrow as pa

    a = _u(arr)
    nd = F.when(a.isNull(), F.lit(None).cast("long")).when(
        F.typeof(a).like("array<array%"), F.lit(2).cast("long")
    ).otherwise(F.lit(1).cast("long"))
    return Expr(_arrow_typed(nd, pa.uint64(), "array_ndims"))


def _same_len_guard(a, b, out):
    """NULL-safe length assertion: mismatched vector lengths raise at
    execute (ref: arrow kernels error with 'same length')."""
    return F.when(
        F.size(a) != F.size(b),
        F.raise_error(F.lit("vector arguments must have the same length")),
    ).otherwise(out)


def array_distance(a, b) -> Expr:
    aa, bb = _u(a).cast("array<double>"), _u(b).cast("array<double>")
    d = F.zip_with(aa, bb, lambda x, y: (x - y) * (x - y))
    out = F.sqrt(F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v))
    return Expr(_same_len_guard(aa, bb, out))


def cosine_distance(a, b) -> Expr:
    from ..operators.similarity import cosine_similarity_col

    aa, bb = _u(a).cast("array<double>"), _u(b).cast("array<double>")
    return Expr(_same_len_guard(aa, bb, 1 - cosine_similarity_col(aa, bb)))


def inner_product(a, b) -> Expr:
    aa, bb = _u(a).cast("array<double>"), _u(b).cast("array<double>")
    d = F.zip_with(aa, bb, lambda x, y: x * y)
    out = F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v)
    return Expr(_same_len_guard(aa, bb, out))


def string_to_array(s, delimiter=",", null_string=None) -> Expr:
    d = _pystr(delimiter, ",") if isinstance(delimiter, Expr) else (delimiter or ",")
    import re as _re

    parts = F.split(_u(s), _re.escape(d))
    if null_string is None:
        return Expr(parts)
    ns = _u(null_string)
    return Expr(F.transform(parts, lambda x: F.when(x == ns, F.lit(None)).otherwise(x)))


string_to_list = string_to_array


def array_to_string(arr, delimiter=",", null_string=None) -> Expr:
    # DataFusion renders numeric elements via Rust Display (1.0 -> "1");
    # Spark casts 1.0 -> "1.0" — trim the trailing .0 to match
    d = _pystr(delimiter, ",") if isinstance(delimiter, Expr) else (delimiter or ",")
    rendered = F.transform(
        _u(arr),
        lambda x: F.regexp_replace(x.cast("string"), r"^(-?\d+)\.0$", r"$1"),
    )
    return Expr(F.array_join(rendered, d, null_string))


array_join = array_to_string
list_to_string = array_to_string
list_join = array_to_string


def flatten(arr) -> Expr:
    # DataFusion drops NULL inner lists; Spark's flatten nulls the whole
    # result if any element is null
    return Expr(F.flatten(F.filter(_u(arr), lambda x: x.isNotNull())))


def range(start, stop=None, step=1) -> Expr:  # noqa: A001
    # half-open [start, stop): offset the inclusive sequence() endpoint by
    # sign(step) so negative steps exclude `stop` from the correct side,
    # e.g. range(10, 4, -2) -> [10, 8, 6], not [10, 8, 6, 4]
    if stop is None:
        start, stop = 0, start
    if isinstance(step, int):
        off = F.lit(1 if step >= 0 else -1)
    else:
        off = F.signum(_u(step)).cast("long")
    return Expr(F.sequence(_u(start), _u(stop) - off, _u(step)))


def generate_series(start, stop=None, step=1) -> Expr:
    if stop is None:
        start, stop = 0, start
    return Expr(F.sequence(_u(start), _u(stop), _u(step)))


gen_series = generate_series


# higher-order: a Python callable is introspected for its parameter names
# and bound via lambda_ (so the user's names survive into the plan —
# ref _to_lambda, functions/__init__.py:564-583); an explicit lambda_()
# Expr invokes the catalyst function with the prebuilt LambdaFunction,
# mirroring pyspark's _invoke_higher_order_function.
def _to_lambda(fn) -> Expr:
    if isinstance(fn, Expr):
        return fn
    if not callable(fn):
        raise TypeError(f"expected an Expr or callable, got {type(fn).__name__}")
    import inspect

    params = list(inspect.signature(fn).parameters)
    if not params:
        raise ValueError("lambda callable must accept at least one parameter")
    return lambda_(params, fn(*[lambda_var(p) for p in params]))


def _hof(sql_name: str, arr, fn) -> Expr:
    from pyspark.sql.classic.column import Column as ClassicColumn, _to_seq

    from pyspark import SparkContext

    lam = _to_lambda(fn)
    sc = SparkContext._active_spark_context
    jc = sc._jvm.PythonSQLUtils.fn(sql_name, _to_seq(sc, [_u(arr)._jc, _u(lam)._jc]))
    return Expr(ClassicColumn(jc))


def array_transform(arr, fn) -> Expr:
    return _hof("transform", arr, fn)


list_transform = array_transform
transform = array_transform


def array_filter(arr, fn) -> Expr:
    return _hof("filter", arr, fn)


list_filter = array_filter


def array_any_match(arr, fn) -> Expr:
    return _hof("exists", arr, fn)


def array_all_match(arr, fn) -> Expr:
    return _hof("forall", arr, fn)


# ---------------------------------------------------------------------------
# struct / map (ref functions/__init__.py:3005-4925)
def struct(*es) -> Expr:
    return Expr(F.struct(*[_u(e) for e in es]))


def named_struct(*pairs) -> Expr:
    """Struct from (name, value) pairs — flat varargs or a single list
    of tuples (ref functions/__init__.py named_struct)."""
    if len(pairs) == 1 and isinstance(pairs[0], (list, tuple)) and pairs[0] and isinstance(pairs[0][0], (list, tuple)):
        flat: list = []
        for name, value in pairs[0]:
            flat.extend((name, value))
        pairs = tuple(flat)
    args: list[Column] = []
    it = iter(pairs)
    for name in it:
        value = next(it)
        args.append(F.lit(name if isinstance(name, str) else name))
        args.append(_u(value))
    return Expr(F.named_struct(*args))


def get_field(e, *names) -> Expr:
    """Nested struct-field access (ref functions/__init__.py get_field):
    ``get_field(col, "a", "b")`` walks outer→inner; requires at least
    one field name."""
    if not names:
        raise ValueError("get_field requires at least one field name")
    c = _u(e)
    for name in names:
        if isinstance(name, str):
            c = c.getField(name)
        else:
            c = F.element_at(c, _u(name))
    return Expr(c)


def make_map(*pairs) -> Expr:
    """Map constructor (ref functions/__init__.py make_map):
    ``make_map({k: v, ...})`` | ``make_map([keys], [values])`` |
    flat ``make_map(k1, v1, k2, v2, ...)``."""
    if len(pairs) == 1 and isinstance(pairs[0], dict):
        flat: list = []
        for k, v in pairs[0].items():
            flat.extend((k, v))
        pairs = tuple(flat)
    elif (
        len(pairs) == 2
        and isinstance(pairs[0], (list, tuple))
        and isinstance(pairs[1], (list, tuple))
    ):
        keys, vals = pairs[0], pairs[1]
        if len(keys) != len(vals):
            raise ValueError(
                "make_map keys and values must have the same length"
            )
        return Expr(F.map_from_arrays(
            F.array(*[_u(k) for k in keys]), F.array(*[_u(v) for v in vals])
        ))
    if len(pairs) % 2 != 0:
        raise ValueError(
            "make_map expects an even number of key/value arguments"
        )
    return Expr(F.create_map(*[_u(p) for p in pairs]))


def map_keys(m) -> Expr:
    return Expr(F.map_keys(_u(m)))


def map_values(m) -> Expr:
    return Expr(F.map_values(_u(m)))


def map_entries(m) -> Expr:
    return Expr(F.map_entries(_u(m)))


def map_extract(m, key) -> Expr:
    """A LIST holding the value for ``key``, [NULL] when absent (ref
    functions/__init__.py map_extract)."""
    return Expr(F.array(F.try_element_at(_u(m), _u(key))))


# ---------------------------------------------------------------------------
# Name-completion sweep vs the reference's functions/__init__.py (324 defs).
# Everything below is either a thin alias (the reference itself aliases
# list_* → array_* — functions/__init__.py:3690-4120), a real Spark-side
# implementation, or an EXPLICIT documented stub for things Spark's type
# system cannot represent (union type, per-expression Arrow field metadata).


def array_normalize(arr) -> Expr:
    """Scale a numeric array to Euclidean length 1 (ref
    functions/__init__.py:3547). Zero vectors pass through unchanged."""
    a = _u(arr)
    norm = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return Expr(
        F.when(norm == 0, a).otherwise(F.transform(a, lambda x: x.cast("double") / norm))
    )


def array_replace_n(arr, from_val, to_val, n) -> Expr:
    """Replace the first ``n`` occurrences of ``from_val`` (ref
    functions/__init__.py array_replace_n). Implemented with indexed
    ``transform`` + a rank check over the prefix — O(len²) per array,
    fine for row-level arrays, runs fully inside codegen."""
    a, f_, t_, n_ = _u(arr), _u(from_val), _u(to_val), _u(n)
    return Expr(
        F.transform(
            a,
            lambda x, i: F.when(
                (x == f_)
                & (F.size(F.filter(F.slice(a, 1, i + 1), lambda y: y == f_)) <= n_),
                t_,
            ).otherwise(x),
        )
    )


def to_local_time(e) -> Expr:
    """Instant → wall-clock in the session timezone, dropping the zone
    (ref functions/__init__.py:2442). Spark's TimestampType is an instant;
    TimestampNTZ is the naive local result — the cast applies the session
    timezone, including DST rules."""
    return Expr(_u(e).cast("timestamp_ntz"))


# Spark has no TIME type (SURVEY §1.3): times-of-day are represented as
# TimestampType anchored at 1970-01-01, which preserves comparison,
# arithmetic, and formatting semantics. Documented deviation.
def to_time(e, *formatters) -> Expr:
    """Time-of-day (ref functions/__init__.py:2450; Time64(ns) in the
    reference). Computed over the anchored-timestamp encoding and tagged
    Time64 for export; unparseable input raises like DataFusion's cast
    error instead of yielding NULL."""
    import pyarrow as pa

    s = _u(e)
    anchored = F.concat(F.lit("1970-01-01 "), s)
    if formatters:
        fmt = _pystr(formatters[0], formatters[0]) if isinstance(formatters[0], Expr) else formatters[0]
        parsed = F.try_to_timestamp(
            anchored, F.lit("yyyy-MM-dd " + _chrono_to_java(fmt))
        )
    else:
        parsed = F.try_to_timestamp(anchored)
    guarded = F.when(
        s.isNotNull() & parsed.isNull(),
        F.raise_error(F.concat(F.lit("Error parsing '"), s, F.lit("' as time")))
        .cast("timestamp"),
    ).otherwise(parsed)
    return Expr(_arrow_typed(guarded, pa.time64("ns"), "to_time"))


def make_time(hour, minute, second) -> Expr:
    """ref functions/__init__.py:2851; anchored-timestamp TIME encoding,
    tagged Time64(ns) for export."""
    import pyarrow as pa

    total = (
        _u(hour).cast("long") * 3600 + _u(minute).cast("long") * 60 + _u(second).cast("long")
    )
    return Expr(_arrow_typed(F.timestamp_seconds(total), pa.time64("ns"), "make_time"))


def current_time() -> Expr:
    """Current UTC time-of-day (ref functions/__init__.py:2689), anchored
    at the epoch day."""
    return Expr(F.timestamp_seconds(F.unix_timestamp(F.current_timestamp()) % 86400))


def with_metadata(e, metadata: dict) -> Expr:
    """Attach field metadata (ref functions/__init__.py:3256). Spark
    carries metadata on named fields, so this aliases the column to its
    current name with the metadata attached."""
    if not metadata:
        return e if isinstance(e, Expr) else Expr(_u(e))
    if any(not k for k in metadata):
        raise ValueError("metadata keys must be non-empty strings")
    c = _u(e)
    try:
        name = c._jc.toString().rsplit(" AS ", 1)[-1].strip("`")
    except Exception:  # pragma: no cover - py4j detail
        name = "col"
    return Expr(c.alias(name, metadata=dict(metadata)))




# column-name → Arrow field metadata, recorded at in-memory ingestion
# (see SessionContext.from_arrow) — arrow_metadata is expression-level
# and cannot see the enclosing frame
_FIELD_METADATA: dict = {}


def arrow_metadata(e, key=None) -> Expr:
    """Arrow field metadata of the expression (ref
    functions/__init__.py:3222): a map of all pairs, or the value for
    ``key``. Schema-dependent — resolved against the enclosing frame in
    a select; falls back to alias-attached or ingestion-recorded
    metadata."""
    from .expr import DeferredExpr

    key = _lit_only(key, "arrow_metadata", "key") if key is not None else None
    src_e = e if isinstance(e, Expr) else Expr(_u(e))

    def _static_md() -> dict:
        md = {}
        try:
            n = src_e._jnode()
            if n.getClass().getSimpleName() == "Alias":
                import json as _json

                md = _json.loads(str(n.metadata().json())) if hasattr(n, "metadata") else {}
        except Exception:
            md = {}
        if not md:
            try:
                name = str(src_e.expr._jc.toString()).split(".")[-1].strip("`")
                md = _FIELD_METADATA.get(name, {})
            except Exception:
                md = {}
        return md

    def _col_for(md: dict):
        if key is not None:
            return F.lit(md.get(key))
        if not md:
            return F.lit(None).cast("map<string,string>")
        return F.create_map(*[
            x for k, v in md.items() for x in (F.lit(str(k)), F.lit(str(v)))
        ])

    def build(sdf):
        from .dataframe import DataFrame as _DF

        md = {}
        try:
            fld = _DF(sdf.select(_u(src_e))).schema().field(0)
            md = {
                (k.decode() if isinstance(k, bytes) else str(k)):
                (v.decode() if isinstance(v, bytes) else str(v))
                for k, v in (fld.metadata or {}).items()
            }
        except Exception:
            md = {}
        return _col_for(md or _static_md())

    return DeferredExpr(build, _col_for(_static_md()))


def union_extract(union_expr, field_name) -> Expr:
    """Value of one union variant, NULL for rows holding another (ref
    functions/__init__.py:3348). Arrow unions ingest as a tagged struct
    (see SessionContext.from_arrow) — extraction is a struct field
    read."""
    name = _pystr(field_name, field_name) if isinstance(field_name, Expr) else field_name
    return Expr(_u(union_expr).getField(str(name)))


def union_tag(union_expr) -> Expr:
    """Name of the active union variant per row (ref
    functions/__init__.py:3375) — the ingestion-recorded tag field."""
    return Expr(_u(union_expr).getField("__union_tag"))


def approx_percentile_cont_with_weight(
    e, weight, percentile, num_centroids: int | None = None, filter=None
) -> Expr:
    """Weighted percentile aggregate (ref functions/__init__.py
    approx_percentile_cont_with_weight). Spark's ``percentile`` takes an
    integral frequency column — EXACT weighted percentile where the
    reference's is a t-digest approximation (strictly tighter, documented
    deviation). Weights are cast to int (frequencies); num_centroids is
    accepted for signature parity (the exact path has no sketch)."""
    c, state = _agg_input(e)  # accepts SortExpr input like the reference
    if filter is not None:
        state["filter"] = _u(filter)
    c = _filtered(c, state)
    p = percentile if isinstance(percentile, (int, float)) else _u(percentile)
    # fractional weights: scale to integral frequencies (percentiles are
    # invariant under uniform weight scaling; 1e6 keeps int weights exact)
    freq = F.greatest(F.round(_u(weight) * 1000000).cast("long"), F.lit(0).cast("long"))
    return Expr(F.percentile(c, F.lit(p) if isinstance(p, (int, float)) else p, freq))


# Spark uniquifies each UnresolvedNamedLambdaVariable ("v" -> "v_3"), so
# the body and the LambdaFunction's argument list must share the SAME
# variable instance; lambda_var registers the instance it handed out and
# lambda_ picks it back up by the user-visible name.
_LAMBDA_VARS: dict[str, Column] = {}


def lambda_var(name: str) -> Expr:
    """Unresolved reference to a lambda parameter (ref
    functions/__init__.py:512). Backed by Spark's own
    ``UnresolvedNamedLambdaVariable``, so any builtin applies over it and
    Catalyst binds it inside the owning higher-order function."""
    from pyspark.sql.functions.builtin import _unresolved_named_lambda_variable

    c = _unresolved_named_lambda_variable(name)
    _LAMBDA_VARS[name] = c
    return Expr(c)


def lambda_(params, body) -> Expr:
    """Explicit lambda from parameter names + body Expr (ref
    functions/__init__.py:535). Builds a Catalyst ``LambdaFunction`` via the
    same ``PythonSQLUtils.lambdaFunction`` path PySpark's callable binding
    uses; the result is an Expr the higher-order functions accept in place
    of a Python callable."""
    from pyspark.sql.classic.column import Column as ClassicColumn, _to_seq
    from pyspark.sql.functions.builtin import _unresolved_named_lambda_variable

    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    body_e = body if isinstance(body, Expr) else Expr(_u(body))
    jvars = [
        _LAMBDA_VARS[p] if p in _LAMBDA_VARS else _unresolved_named_lambda_variable(p)
        for p in params
    ]
    jargs = _to_seq(sc, [v._jc for v in jvars])
    jlam = sc._jvm.PythonSQLUtils.lambdaFunction(_u(body_e)._jc, jargs)
    out = Expr(ClassicColumn(jlam))
    out._is_lambda = True
    return out


# aliases matching the reference's own alias surface
any_match = array_any_match
array_contains = array_has
array_push_back = array_append
array_push_front = array_prepend
dot_product = inner_product
is_nan = isnan
make_list = make_array
var_population = var_pop
var_sample = var_samp
list_any_match = array_any_match
list_any_value = array_any_value
list_append = array_append
list_cat = array_cat
list_compact = array_compact
list_concat = array_concat
list_contains = array_has
list_dims = array_dims
list_distance = array_distance
list_distinct = array_distinct
list_element = array_element
list_empty = array_empty
list_except = array_except
list_extract = array_extract
list_has = array_has
list_has_all = array_has_all
list_has_any = array_has_any
list_indexof = array_indexof
list_intersect = array_intersect
list_max = array_max
list_min = array_min
list_ndims = array_ndims
list_normalize = array_normalize
list_overlap = arrays_overlap
list_pop_back = array_pop_back
list_pop_front = array_pop_front
list_position = array_position
list_positions = array_positions
list_prepend = array_prepend
list_push_back = array_append
list_push_front = array_prepend
list_remove = array_remove
list_remove_all = array_remove_all
list_remove_n = array_remove_n
list_repeat = array_repeat
list_replace = array_replace
list_replace_all = array_replace_all
list_replace_n = array_replace_n
list_resize = array_resize
list_reverse = array_reverse
list_slice = array_slice
list_union = array_union
list_zip = arrays_zip


# ---------------------------------------------------------------------------
# registry for SQL-name lookup and coverage tests
_REGISTRY = {k: v for k, v in list(globals().items()) if callable(v) and not k.startswith("_")}


def function_names() -> list[str]:
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------
# Expr method forms (ref expr.py: the reference attaches method versions of
# many scalar functions to Expr — `col("x").abs()`, `.sha256()`,
# `.array_length()`, ... — so expression chains read left-to-right).
# Delegate each to the module-level function; skip names Expr defines
# itself (alias/filter/order_by/cast/... keep their builder semantics).
_EXPR_METHOD_NAMES = [
    "abs", "acos", "acosh", "array_dims", "array_distinct", "array_empty",
    "array_length", "array_ndims", "array_pop_back", "array_pop_front",
    "arrow_typeof", "ascii", "asin", "asinh", "atan", "atanh", "bit_length",
    "btrim", "cardinality", "cbrt", "ceil", "char_length", "character_length",
    "chr", "cos", "cosh", "cot", "degrees", "exp", "factorial", "flatten",
    "floor", "from_unixtime", "initcap", "isnan", "iszero", "length",
    "list_dims", "list_distinct", "list_length", "list_ndims", "ln", "log10",
    "log2", "lower", "ltrim", "md5", "octet_length", "radians", "reverse",
    "rtrim", "sha224", "sha256", "sha384", "sha512", "signum", "sin", "sinh",
    "sqrt", "tan", "tanh", "to_hex", "trim", "upper",
]
_EXPR_METHOD_ALIASES = {
    "empty": "array_empty",  # ref Expr.empty()
    "is_nan": "isnan",
}


def _attach_expr_methods() -> None:
    from .expr import Expr as _Expr

    def make(fn, name):
        def method(self, *args, **kwargs):
            return fn(self, *args, **kwargs)

        method.__name__ = name
        method.__doc__ = f"Method form of ``functions.{fn.__name__}`` (ref Expr.{name})."
        return method

    for name in _EXPR_METHOD_NAMES:
        fn = _REGISTRY.get(name)
        if fn is not None and not hasattr(_Expr, name):
            setattr(_Expr, name, make(fn, name))
    for name, target in _EXPR_METHOD_ALIASES.items():
        fn = _REGISTRY.get(target)
        if fn is not None and not hasattr(_Expr, name):
            setattr(_Expr, name, make(fn, name))


_attach_expr_methods()


# ref functions/spark.py — importable as functions.spark
from . import spark_functions as spark  # noqa: E402
