from .reference import (  # noqa: F401
    ref_aggregate,
    ref_curve_interpolation,
    ref_range_check,
    ref_rate_of_change,
    ref_regularize,
)
