from . import hashing, text, vector  # noqa: F401
