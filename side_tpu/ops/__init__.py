from . import decode, losses  # noqa: F401
