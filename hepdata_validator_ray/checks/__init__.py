from hepdata_validator_ray.checks.base import (
    Check,
    CheckContext,
    CheckSuite,
    get_check_suite,
    register_check_suite,
)
from hepdata_validator_ray.checks.row_checks import DEFAULT_ROW_CHECKS, build_default_suite

__all__ = [
    "Check",
    "CheckContext",
    "CheckSuite",
    "get_check_suite",
    "register_check_suite",
    "DEFAULT_ROW_CHECKS",
    "build_default_suite",
]
