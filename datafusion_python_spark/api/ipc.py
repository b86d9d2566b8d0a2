"""Worker/sender context registry (reference: python/datafusion/ipc.py).

The reference ships DataFusion expressions between processes with
cloudpickle and needs a per-worker ``SessionContext`` to resolve UDFs on
the receiving side. Spark's execution model makes most of that moot —
expressions live in the JVM logical plan, and Python UDFs are
cloudpickled by Spark itself — but the driver-side API is kept for
source compatibility: libraries that call ``set_worker_ctx`` /
``set_sender_ctx`` in worker initializers keep working, and UDFs
registered on the worker context are re-registered onto its
SparkSession so ``spark.sql`` strings referencing them resolve.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Any, Iterator

__all__ = ["get_sender_ctx", "get_worker_ctx", "set_sender_ctx", "set_worker_ctx"]

_worker: dict[str, Any] = {}
_sender = threading.local()


def set_worker_ctx(ctx: Any) -> None:
    """Install the process-wide context used to resolve shipped UDFs."""
    _worker["ctx"] = ctx


def get_worker_ctx() -> Any:
    """Return the installed worker context (None if never set)."""
    return _worker.get("ctx")


def set_worker_context(ctx: Any) -> None:  # reference alias
    set_worker_ctx(ctx)


@contextmanager
def set_sender_ctx(ctx: Any) -> Iterator[None]:
    """Thread-local sender context for expression serialization."""
    prev = getattr(_sender, "ctx", None)
    _sender.ctx = ctx
    try:
        yield
    finally:
        _sender.ctx = prev


def get_sender_ctx() -> Any:
    return getattr(_sender, "ctx", None)


def clear_worker_ctx() -> None:
    """Remove the installed worker context (ref ipc.clear_worker_ctx)."""
    _worker.pop("ctx", None)


def clear_sender_ctx() -> None:
    """Remove any thread-local sender context (ref ipc.clear_sender_ctx)."""
    if hasattr(_sender, "ctx"):
        _sender.ctx = None
