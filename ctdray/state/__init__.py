from .manifest import run_checkpointed, read_manifest, read_result  # noqa: F401
