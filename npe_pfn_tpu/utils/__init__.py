from . import pytree_io  # noqa: F401
