from . import transformer  # noqa: F401  (registration side effects)
from . import pointnetv2  # noqa: F401
from . import dgcnn  # noqa: F401
from . import pointmlp  # noqa: F401
from . import pointnet2_votes  # noqa: F401

# the reference ``pointnet2.pointnet2_modules`` public surface
# (``pointnet2/pointnet2_modules.py:23-722``)
from .pointnetv2 import (  # noqa: F401
    PointnetSAModule, PointnetSAModuleMSG, PointnetFPModule,
    PointNetFeaturePropagation)
from .pointnet2_votes import (  # noqa: F401
    PointnetSAModuleVotes, PointnetSAModuleVotes_nofps,
    PointnetSAModuleVotes_nogrouping, PointnetSAModuleMSGVotes,
    PointnetLFPModuleMSG)
