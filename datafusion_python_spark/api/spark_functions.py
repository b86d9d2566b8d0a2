"""Spark-compat function module (ref python/datafusion/functions/spark.py,
1,826 LoC, 89 registrations; enabled in the reference via
ctx.enable_spark_functions(), context.py:1408).

The reference added these to *match Spark semantics* — here they ARE
Spark, so each name binds 1:1 to pyspark.sql.functions (wrapped in our
Expr). Exposed both as this module and for SQL via plain spark.sql.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .expr import Expr, _c


def _cn(v):
    """ColumnOrName: bare strings are column references (pyspark
    convention), everything else coerces like _c."""
    if isinstance(v, str):
        return F.col(v)
    return _c(v)


def _pv(v, default=None):
    """Python value from a native literal or a literal Expr (count/str
    style args that pyspark wants as plain Python values)."""
    if isinstance(v, Expr):
        try:
            return v.python_value()
        except Exception:
            return default
    return v if v is not None else default


def _w1(fn):
    def g(e):
        return Expr(fn(_c(e)))

    return g


def _w2(fn):
    def g(a, b):
        return Expr(fn(_c(a), _c(b)))

    return g


# aggregates
avg = _w1(F.avg)
try_sum = _w1(F.try_sum)
collect_list = _w1(F.collect_list)
collect_set = _w1(F.collect_set)

# arrays
array_contains = _w2(F.array_contains)
def array(*es): return Expr(F.array(*[_c(e) for e in es]))
def shuffle(e, seed=None):
    if seed is not None:
        raise NotImplementedError(
            "spark.shuffle: the seed parameter is not supported"
        )
    return Expr(F.shuffle(_c(e)))
def array_repeat(e, n): return Expr(F.array_repeat(_c(e), _c(n).cast("int")))
def slice(arr, start, length): return Expr(F.slice(_c(arr), _c(start), _c(length)))  # noqa: A001
size = _w1(F.size)

# bits / bitmaps
bitmap_count = _w1(F.bitmap_count)
bitmap_bit_position = _w1(F.bitmap_bit_position)
bitmap_bucket_number = _w1(F.bitmap_bucket_number)
bitmap_construct_agg = _w1(F.bitmap_construct_agg)
def bit_get(e, pos): return Expr(F.getbit(_c(e), _c(pos)))
bit_count = _w1(F.bit_count)
bitwise_not = _w1(F.bitwise_not)
def _nbits(n):
    # pyspark's shift functions take the bit count as a plain int
    v = _pv(n, None)
    return int(v) if v is not None else n
def shiftleft(e, n): return Expr(F.shiftleft(_c(e), _nbits(n)))
def shiftright(e, n): return Expr(F.shiftright(_c(e), _nbits(n)))
def shiftrightunsigned(e, n): return Expr(F.shiftrightunsigned(_c(e), _nbits(n)))

# conditional
def if_(cond, a, b): return Expr(F.when(_c(cond), _c(a)).otherwise(_c(b)))
def spark_cast(e, t):
    return Expr(_c(e).cast(_pv(t, t) if isinstance(t, Expr) else t))

# datetime — count args must be INT (lit() defaults Python ints to
# bigint per DataFusion semantics; Spark's date arithmetic wants int)
def add_months(d, n): return Expr(F.add_months(_c(d), _c(n).cast("int")))
def date_add(d, n): return Expr(F.date_add(_c(d), _c(n).cast("int")))
def date_sub(d, n): return Expr(F.date_sub(_c(d), _c(n).cast("int")))
hour = _w1(F.hour)
minute = _w1(F.minute)
second = _w1(F.second)
last_day = _w1(F.last_day)
def next_day(e, day): return Expr(F.next_day(_c(e), _pv(day, day) if isinstance(day, Expr) else day))
date_diff = _w2(F.datediff)
def date_trunc(fmt, e):
    # Spark's date_trunc always yields an instant TIMESTAMP; the
    # reference's naive inputs stay naive — NTZ under the UTC session
    f = _pv(fmt, fmt) if isinstance(fmt, Expr) else fmt
    return Expr(F.date_trunc(f, _c(e)).cast("timestamp_ntz"))
def trunc(e, fmt): return Expr(F.trunc(_c(e), _pv(fmt, fmt) if isinstance(fmt, Expr) else fmt))
def date_part(part, e): return Expr(F.date_part(F.lit(_pv(part, part)) if isinstance(part, Expr) else F.lit(part), _c(e)))
from_utc_timestamp = _w2(F.from_utc_timestamp)
to_utc_timestamp = _w2(F.to_utc_timestamp)
unix_date = _w1(F.unix_date)
unix_micros = _w1(F.unix_micros)
unix_millis = _w1(F.unix_millis)
unix_seconds = _w1(F.unix_seconds)
def make_interval(years=0, months=0, weeks=0, days=0, hours=0, mins=0, secs=0):
    """Calendar interval → IntervalMonthDayNano (the reference's return
    type; Spark's CalendarIntervalType has no Arrow export, so the value
    is stored as its month/day/nanos struct and restored on export)."""
    import base64 as _b64

    import pyarrow as pa

    from .expr import ARROW_LIT_META_KEY

    def iv(v):
        return _c(v).cast("int")

    months_total = (iv(years) * F.lit(12) + iv(months)).cast("int")
    days_total = (iv(weeks) * F.lit(7) + iv(days)).cast("int")
    nanos = (
        (_c(hours).cast("bigint") * F.lit(3600) + _c(mins).cast("bigint") * F.lit(60))
        * F.lit(1_000_000_000)
        + (_c(secs).cast("decimal(18,6)") * F.lit(1_000_000_000)).cast("bigint")
    )
    col = F.struct(
        months_total.alias("months"),
        days_total.alias("days"),
        nanos.alias("nanoseconds"),
    )
    tag = _b64.b64encode(
        pa.schema([pa.field("t", pa.month_day_nano_interval())])
        .serialize()
        .to_pybytes()
    ).decode()
    return Expr(col.alias("make_interval", metadata={ARROW_LIT_META_KEY: tag}))
def make_dt_interval(days=0, hours=0, mins=0, secs=0):
    return Expr(F.make_dt_interval(_c(days).cast("int"), _c(hours).cast("int"), _c(mins).cast("int"), _c(secs).cast("decimal(18,6)")))

# hash
crc32 = _w1(F.crc32)
sha1 = _w1(F.sha1)
def sha2(e, bits): return Expr(F.sha2(_c(e), int(_pv(bits, 256))))
def xxhash64(*es): return Expr(F.xxhash64(*[_c(e) for e in es]))

# json / map
def json_tuple(e, *fields):
    return Expr(F.json_tuple(_c(e), *[
        _pv(f, f) if isinstance(f, Expr) else f for f in fields
    ]))
map_from_arrays = _w2(F.map_from_arrays)
map_from_entries = _w1(F.map_from_entries)
def str_to_map(e, pair_delim=",", kv_delim=":", pairDelim=None, keyValueDelim=None):
    # both the reference's snake_case and pyspark's camelCase names
    if pairDelim is not None:
        pair_delim = pairDelim
    if keyValueDelim is not None:
        kv_delim = keyValueDelim
    return Expr(F.str_to_map(_c(e), _c(pair_delim), _c(kv_delim)))

# math
abs = _w1(F.abs)  # noqa: A001
ceil = _w1(F.ceil)
expm1 = _w1(F.expm1)
factorial = _w1(F.factorial)
floor = _w1(F.floor)
hex = _w1(F.hex)  # noqa: A001
def modulus(a, b): return Expr(_c(a) % _c(b))
pmod = _w2(F.pmod)
rint = _w1(F.rint)
def round(e, scale=0): return Expr(F.round(_c(e), int(_pv(scale, 0) or 0)))  # noqa: A001
unhex = _w1(F.unhex)
def width_bucket(v, lo, hi, n): return Expr(F.width_bucket(_c(v), _c(lo), _c(hi), _c(n)))
csc = _w1(F.csc)
sec = _w1(F.sec)
def negative(e): return Expr(-_c(e))
bin = _w1(F.bin)  # noqa: A001

# strings
ascii = _w1(F.ascii)  # noqa: A001
base64 = _w1(F.base64)
char = _w1(F.char)
def concat(*es): return Expr(F.concat(*[_c(e) for e in es]))
def elt(n, *es): return Expr(F.elt(_c(n), *[_c(e) for e in es]))
def ilike(s, pat, escapeChar=None):
    # ColumnOrName semantics: a bare str names a COLUMN (pyspark F.ilike)
    if escapeChar is not None:
        raise NotImplementedError("spark.ilike: escapeChar is not supported")
    return Expr(F.ilike(_cn(s), _cn(pat)))
length = _w1(F.length)
def like(s, pat, escapeChar=None):
    # ColumnOrName semantics: a bare str names a COLUMN (pyspark F.like)
    if escapeChar is not None:
        raise NotImplementedError("spark.like: escapeChar is not supported")
    return Expr(F.like(_cn(s), _cn(pat)))
def luhn_check(e): return Expr(F.call_function("luhn_check", _c(e)))
def format_string(fmt, *es):
    fmt = _pv(fmt, fmt) if isinstance(fmt, Expr) else fmt
    return Expr(F.format_string(fmt, *[_c(e) for e in es]))
def space(n): return Expr(F.call_function("space", _c(n)))
def substring(s, pos, ln): return Expr(F.substring(_c(s), _c(pos), _c(ln)))
unbase64 = _w1(F.unbase64)
soundex = _w1(F.soundex)
def is_valid_utf8(e): return Expr(F.is_valid_utf8(_c(e)))
def make_valid_utf8(e): return Expr(F.make_valid_utf8(_c(e)))
def parse_url(e, part, key=None):
    if key is not None:
        return Expr(F.parse_url(_c(e), _c(part), _c(key)))
    return Expr(F.parse_url(_c(e), _c(part)))
def try_parse_url(e, part, key=None):
    try:
        if key is not None:
            return Expr(F.try_parse_url(_c(e), _c(part), _c(key)))
        return Expr(F.try_parse_url(_c(e), _c(part)))
    except AttributeError:  # pyspark < 4.0
        return parse_url(e, part, key)
def url_decode(e): return Expr(F.url_decode(_c(e)))
def url_encode(e): return Expr(F.url_encode(_c(e)))
def try_url_decode(e):
    try:
        return Expr(F.try_url_decode(_c(e)))
    except AttributeError:
        return url_decode(e)


def time_trunc(unit, t):
    """Spark ``time_trunc`` (ref functions/spark.py:762) over the
    anchored-timestamp TIME encoding (see api.functions.to_time):
    date_trunc on the epoch-day anchor preserves hour/minute/second
    truncation. Takes a literal unit string (documented deviation: the
    reference also accepts a column)."""
    if not isinstance(unit, str):
        raise NotImplementedError("time_trunc requires a literal unit string here")
    return Expr(F.date_trunc(unit.lower(), _c(t)))


SPARK_FN_NAMES = sorted(
    k for k, v in list(globals().items()) if callable(v) and not k.startswith("_")
)
