from .field import FieldSpec, init_field  # noqa: F401
