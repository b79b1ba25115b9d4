from . import cityscapes  # noqa: F401
