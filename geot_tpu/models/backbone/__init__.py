from . import transformer  # noqa: F401  (registration side effects)
from . import pointnetv2  # noqa: F401
from . import dgcnn  # noqa: F401
from . import pointmlp  # noqa: F401
