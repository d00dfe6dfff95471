from . import paths, text, vectors  # noqa: F401
