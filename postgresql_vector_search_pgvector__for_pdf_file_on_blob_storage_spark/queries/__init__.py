"""Named query registry — the driver contract surface.

Mechanical package split of the former single-file queries.py (round 9,
VERDICT r8 next-round #8): ``_core`` holds the registry dicts, the
``query`` decorator, the ingest cache, and the shared helpers; each
submodule holds one of the original file's sections, imported below in
the ORIGINAL line order so ``QUERIES``/``ORACLES`` registration order —
and therefore the driver sweep, PARITY generation, and bench — is
identical to the single-file layout.  The public surface (``QUERIES``,
``ORACLES``, ``clear_ingest_cache``) is unchanged; see ``_core`` for the
oracle-parity rules that make results hash-match bit-for-bit across
engines.
"""

from ._core import *  # noqa: F401,F403
from ._core import (  # noqa: F401 — the explicit driver-contract surface
    ORACLES,
    QUERIES,
    clear_ingest_cache,
)

# Registration order = original queries.py line order (do not reorder).
from . import vector  # noqa: E402,F401
from . import listings  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import dedup_text  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import rowsonly  # noqa: E402,F401
from . import ranking  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import selection  # noqa: E402,F401
