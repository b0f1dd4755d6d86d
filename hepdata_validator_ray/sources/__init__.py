from hepdata_validator_ray.sources.jsonl import ensure_sequences_jsonl, read_sequences_jsonl
from hepdata_validator_ray.sources.suite_loader import load_suite_config, resolve_suite_refs

__all__ = [
    "ensure_sequences_jsonl",
    "read_sequences_jsonl",
    "load_suite_config",
    "resolve_suite_refs",
]
