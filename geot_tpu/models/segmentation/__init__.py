from . import base_seg  # noqa: F401  (registration side effects)
