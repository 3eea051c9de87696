"""Engine error types (reference: include/common/error.hpp uses Result<T>/Status)."""


class TundraError(Exception):
    """Base class for engine errors."""


class SchemaError(TundraError):
    """Schema registration / resolution failures."""


class QueryError(TundraError):
    """Query construction / execution failures."""
