"""Operators: dedup, similarity search, quality gates, windowing."""

from . import dedup, similarity  # noqa: F401
from .quality import (  # noqa: F401
    DataQualityError,
    expect_no_nulls,
    expect_nonempty,
    expect_unique_key,
)
