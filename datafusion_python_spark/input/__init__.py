"""Input-source plugins (ref python/datafusion/input/__init__.py).

The primary class is ``LocationInputPlugin``, which resolves file
paths into :class:`~..common.SqlTable` metadata.
"""

from .base import BaseInputSource
from .location import LocationInputPlugin

__all__ = [
    "BaseInputSource",
    "LocationInputPlugin",
]
