from . import prior, train  # noqa: F401
