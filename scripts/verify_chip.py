"""CLI for the on-chip Pallas-vs-XLA kernel equivalence gate.

Runs every kernel and its pure-JAX twin at flagship shapes on the current
backend (the real TPU when run plainly on this host) and prints one JSON
line of per-check error stats; exit code 1 if any check is out of
tolerance.  bench.py runs the same checks in-process and embeds the block
in the bench artifact.  See visdial_tpu/verify.py for the check inventory.

    python scripts/verify_chip.py                  # real chip, flagship
    JAX_PLATFORMS=cpu python scripts/verify_chip.py --scale tiny
    python scripts/verify_chip.py --include lstm   # subset by prefix
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from visdial_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from visdial_tpu.verify import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
