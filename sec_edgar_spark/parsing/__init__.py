from . import form4, meta, uu  # noqa: F401
