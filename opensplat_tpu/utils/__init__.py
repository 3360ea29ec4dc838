from .metrics import MetricsLogger, profile_trace  # noqa: F401
