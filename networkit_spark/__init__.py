"""networkit_spark — a from-scratch PySpark-native link-graph analytics engine
with the query/data-processing capabilities of NetworKit (reference at
/root/reference, studied for semantics only; architecture is Spark-first:
DataFrame plans, Catalyst optimization, shuffle-based supersteps).
"""

from .graph import Graph
from .session import get_spark

__all__ = ["Graph", "get_spark"]
__version__ = "0.1.0"
