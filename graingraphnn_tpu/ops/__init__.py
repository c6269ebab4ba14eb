from . import period_conv, segment  # noqa: F401
