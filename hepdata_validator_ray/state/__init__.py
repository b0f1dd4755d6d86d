from hepdata_validator_ray.state.manifest import CheckpointManifest

__all__ = ["CheckpointManifest"]
