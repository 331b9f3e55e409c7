"""Function library: share-structure ops + MPC math, patched onto the
tensor classes at import (reference: curl/common/functions/__init__.py)."""

from . import regular  # noqa: F401  (installs structure ops)
from . import logic  # noqa: F401    (installs comparisons/relu/sign)
from . import maximum  # noqa: F401  (installs max/min/argmax/argmin)
from . import approximations  # noqa: F401  (installs LUT nonlinearities)
from . import pooling  # noqa: F401
from . import power  # noqa: F401
from . import sampling  # noqa: F401
from . import dropout  # noqa: F401
