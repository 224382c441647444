from .debugger import Debugger  # noqa: F401
