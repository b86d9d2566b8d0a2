"""datafusion_python_spark — a PySpark-native analytics engine with the
query surface of apache/datafusion-python.

The reference (read-only at /root/reference) defines *what* to compute:
a SessionContext/DataFrame/Expr API over a batch columnar engine. Here
the execution engine is Apache Spark — logical plans are declared with
the PySpark DataFrame/SQL API and optimized by Catalyst/Tungsten/AQE.
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
