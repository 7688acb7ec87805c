"""Public scalar/aggregate function helpers of the engine.

- determinism: decimal-backed order-independent double aggregation
- dot/norm:    JVM higher-order array math used by similarity search
"""

from ..operators.similarity import dot, norm  # noqa: F401
from .determinism import DEC, davg, dsum, sql_davg, sql_dsum  # noqa: F401
