from . import view_gen  # noqa: F401  (registration side effects)
