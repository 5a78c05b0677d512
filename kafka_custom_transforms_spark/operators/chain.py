"""transform_chain — compose transforms like a Connect transform chain.

The reference is deployed as ``transforms=a,b,c`` in worker config
(README.md:13-15); each transform's output feeds the next. Spark equivalent:
function composition over ``DataFrame -> DataFrame`` callables — identical
code path in batch and Structured Streaming (SURVEY.md §1.4, §3).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame

Transform = Callable[[DataFrame], DataFrame]


def transform_chain(*transforms: Transform) -> Transform:
    """Compose transforms left-to-right: ``transform_chain(a, b)(df) == b(a(df))``."""

    def _chained(df: DataFrame) -> DataFrame:
        return functools.reduce(lambda acc, t: t(acc), transforms, df)

    return _chained
