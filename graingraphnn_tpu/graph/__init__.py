from . import geometry, schema, state  # noqa: F401
