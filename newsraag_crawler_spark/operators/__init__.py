from . import dedup, frontier, politeness, similarity, stats, wave  # noqa: F401
