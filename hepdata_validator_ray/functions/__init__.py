from hepdata_validator_ray.functions.parsing import (
    check_range_string,
    parse_numeric_or_range,
    parse_numeric_with_percent,
    RANGE_PATTERN,
)

__all__ = ["parse_numeric_with_percent", "parse_numeric_or_range", "check_range_string", "RANGE_PATTERN"]
