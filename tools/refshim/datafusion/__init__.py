"""Import shim: presents ``datafusion_python_spark`` under the name
``datafusion`` so the reference's own test suite (and any user code
written against apache/datafusion-python) runs unmodified against this
package. Used by tools/refconform.py; also a one-line migration path
for real users (put this directory on PYTHONPATH).
"""

import importlib
import sys

import datafusion_python_spark as _pkg

_this = sys.modules[__name__]
for _k in dir(_pkg):
    if not _k.startswith("_"):
        setattr(_this, _k, getattr(_pkg, _k))
__all__ = list(getattr(_pkg, "__all__", []))
__version__ = getattr(_pkg, "__version__", "0.0.0-spark")

_SUBMODULES = {
    "catalog": "datafusion_python_spark.api.catalog",
    "common": "datafusion_python_spark.common",
    "context": "datafusion_python_spark.api.context",
    "dataframe": "datafusion_python_spark.api.dataframe",
    "dataframe_formatter": "datafusion_python_spark.api.dataframe_formatter",
    "expr": "datafusion_python_spark.api.expr",
    "functions": "datafusion_python_spark.api.functions",
    "input": "datafusion_python_spark.input",
    "io": "datafusion_python_spark.io",
    "ipc": "datafusion_python_spark.api.ipc",
    "object_store": "datafusion_python_spark.sources.object_store",
    "options": "datafusion_python_spark.api.options",
    "plan": "datafusion_python_spark.api.plan",
    "record_batch": "datafusion_python_spark.api.record_batch",
    "substrait": "datafusion_python_spark.api.substrait",
    "unparser": "datafusion_python_spark.api.substrait",
    "user_defined": "datafusion_python_spark.api.udf",
}

# modules whose classes also surface under an alias (re-export sources)
_EXTRA_SOURCES = {
    "expr": ["datafusion_python_spark.api.expr_nodes"],
}

_seen_targets: set = set()
for _name, _target in _SUBMODULES.items():
    _mod = importlib.import_module(_target)
    sys.modules[f"datafusion.{_name}"] = _mod
    setattr(_this, _name, _mod)
    if _target in _seen_targets:  # aliased module (substrait/unparser)
        continue
    _seen_targets.add(_target)
    # failed from-imports name the module via __name__ — report the
    # datafusion.* alias (the real name stays in sys.modules too)
    _mod.__name__ = f"datafusion.{_name}"
    # Public classes report __module__ under the datafusion.* name —
    # the reference's tests (and user isinstance/pickle paths) check it.
    _sources = {_target, *_EXTRA_SOURCES.get(_name, [])}
    for _attr in dir(_mod):
        if _attr.startswith("_"):
            continue
        _obj = getattr(_mod, _attr)
        if isinstance(_obj, type) and getattr(_obj, "__module__", "") in _sources:
            try:
                _obj.__module__ = f"datafusion.{_name}"
            except (AttributeError, TypeError):
                pass

# the "internal layer": a synthesized module exposing the same objects
# the wrappers wrap (Catalyst is the real engine), see
# datafusion_python_spark._internal for the rationale
_internal_mod = importlib.import_module("datafusion_python_spark._internal")
sys.modules["datafusion._internal"] = _internal_mod
setattr(_this, "_internal", _internal_mod)
for _k in dir(_internal_mod):
    _obj = getattr(_internal_mod, _k)
    if isinstance(_obj, type(sys)) and _obj.__name__.startswith(
        "datafusion_python_spark._internal."
    ):
        sys.modules[
            "datafusion._internal." + _obj.__name__.rsplit(".", 1)[-1]
        ] = _obj

# `from datafusion.functions import spark`
sys.modules["datafusion.functions.spark"] = importlib.import_module(
    "datafusion_python_spark.api.spark_functions"
)
# keep `datafusion.input.location` importable through the package path
sys.modules["datafusion.input.base"] = importlib.import_module(
    "datafusion_python_spark.input.base"
)
sys.modules["datafusion.input.location"] = importlib.import_module(
    "datafusion_python_spark.input.location"
)
