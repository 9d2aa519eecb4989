from . import snapshot_store  # noqa: F401
