from .exact import dsum, davg, ratio_pct, round1  # noqa: F401
