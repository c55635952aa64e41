"""Column-expression builders: portable hashing, text analysis, vectors."""

from . import annotator, hashing  # noqa: F401
