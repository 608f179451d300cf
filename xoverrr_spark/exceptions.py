"""Exception taxonomy — parity with the reference hierarchy
(``/root/reference/src/xoverrr/exceptions.py:1-22``)."""


class DQCheckException(Exception):
    """Base class for all engine errors."""


class MetadataError(DQCheckException):
    """Schema/key resolution failures (missing PK, unknown columns)."""


class QueryExecutionError(DQCheckException):
    """A Spark job or SQL statement failed."""


class TypeConversionError(DQCheckException):
    """Canonical-string normalization could not handle a column type."""
