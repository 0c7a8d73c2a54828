from . import cls_base  # noqa: F401  (registration side effects)
