from .casts import safe_get_value, value_as_double, value_as_int
from .predicates import all_, any_, like_, not_

__all__ = [
    "like_", "all_", "any_", "not_",
    "value_as_int", "value_as_double", "safe_get_value",
]
