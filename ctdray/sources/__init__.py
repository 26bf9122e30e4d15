from . import docs, media  # noqa: F401
