from . import allocation, distributions, math  # noqa: F401
