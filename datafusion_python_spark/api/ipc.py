"""Worker/sender context registry (reference: python/datafusion/ipc.py).

The reference ships DataFusion expressions between processes with
cloudpickle and consults a per-worker ``SessionContext`` to resolve
UDFs on the receiving side; a thread-local *sender* context selects the
encoding codec (inline cloudpickle payload vs by-name). Spark's
execution model makes most of that moot — expressions live in the JVM
logical plan and Spark cloudpickles Python UDFs itself — but the API
and wire behavior are kept: ``Expr.to_bytes``/``from_bytes`` implement
the same inline/strict codec split (see expr.py), and both contexts are
thread-local exactly like the reference's."""

from __future__ import annotations

import threading
from typing import Any

__all__ = [
    "clear_sender_ctx",
    "clear_worker_ctx",
    "get_sender_ctx",
    "get_worker_ctx",
    "set_sender_ctx",
    "set_worker_ctx",
]

_worker = threading.local()
_sender = threading.local()


def set_worker_ctx(ctx: Any) -> None:
    """Install this thread's context used to resolve shipped UDFs."""
    _worker.ctx = ctx


def get_worker_ctx() -> Any:
    """Return the installed worker context (None if never set)."""
    return getattr(_worker, "ctx", None)


def clear_worker_ctx() -> None:
    """Remove the installed worker context (ref ipc.clear_worker_ctx)."""
    _worker.ctx = None


def set_worker_context(ctx: Any) -> None:  # reference alias
    set_worker_ctx(ctx)


def set_sender_ctx(ctx: Any) -> None:
    """Install this thread's sender context (selects the wire codec)."""
    _sender.ctx = ctx


def get_sender_ctx() -> Any:
    return getattr(_sender, "ctx", None)


def clear_sender_ctx() -> None:
    """Remove any thread-local sender context (ref ipc.clear_sender_ctx)."""
    _sender.ctx = None
