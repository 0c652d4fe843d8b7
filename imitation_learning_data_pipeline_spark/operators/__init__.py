from . import multimodal  # noqa: F401
