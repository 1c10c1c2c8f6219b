from . import codegen  # noqa: F401
