"""Model IO: MPS and LP-format readers/writers.

Equivalent of the CoinMpsIO / CoinLpIO capability the reference relies on
(ClpModel.hpp:24, ClpSimplex.hpp:282), re-implemented from the MPS/LP format
specifications (not ported).
"""

from .mps import read_mps, write_mps  # noqa: F401
from .lp_format import read_lp, write_lp  # noqa: F401
