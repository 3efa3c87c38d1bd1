"""Query catalog over the driver's testdata tables (re-export shim).

The former 11k-line monolith now lives in family modules
(``q_relational`` .. ``q_recent``); this shim re-exports every public
entry so ``from ..pipelines import queries as q`` keeps working
unchanged.  See each family module for the operator docs.
"""

from .q_relational import *  # noqa: F401,F403
from .q_relational import _pairs_in_shards, _ppm  # noqa: F401  (unit-tested)
from .q_vectors import *  # noqa: F401,F403
from .q_breadth import *  # noqa: F401,F403
from .q_training import *  # noqa: F401,F403
from .q_streaming import *  # noqa: F401,F403
from .q_stats import *  # noqa: F401,F403
from .q_stats import _skyline_points  # noqa: F401  (unit-tested helper)
from .q_behavior import *  # noqa: F401,F403
from .q_recent import *  # noqa: F401,F403
