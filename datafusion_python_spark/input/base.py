"""``BaseInputSource`` — extension point for custom input sources
(ref python/datafusion/input/base.py).

A consuming library extends this class and registers the plugin with
the SessionContext so arbitrary inputs can be resolved into
:class:`~..common.SqlTable` metadata.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

from ..common import SqlTable


class BaseInputSource(ABC):
    """Base input-source plugin (ref input/base.py:42)."""

    @abstractmethod
    def is_correct_input(self, input_item: Any, table_name: str, **kwargs: Any) -> bool:
        """Return ``True`` if this plugin can handle ``input_item``."""

    @abstractmethod
    def build_table(self, input_item: Any, table_name: str, **kwargs: Any) -> SqlTable:
        """Create a table description from the input source."""
