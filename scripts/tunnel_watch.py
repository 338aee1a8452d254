"""Watch the tunneled TPU through bench's killable probe gate.

The axon tunnel goes fully down for multi-hour stretches (7h+ observed
overnight, round 4); a first dispatch then hangs unkillably inside a C
call, so the only safe poll is bench.wait_for_device's subprocess probe.
Run this in the background during an outage and poll the status file:

    python scripts/tunnel_watch.py &          # writes /tmp/tunnel_status
    cat /tmp/tunnel_status                    # "down as of HH:MM:SS" / "UP at ..."

Exits 0 the moment the device answers, so `python scripts/tunnel_watch.py
&& python bench.py` chains a bench onto recovery (bench's own gate then
passes instantly).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import bench

STATUS = pathlib.Path("/tmp/tunnel_status")
PROBE_TIMEOUT_S = 180.0
SLEEP_S = 600.0


def main() -> int:
    t0 = time.time()
    while True:
        ok = bench.wait_for_device(max_wait_s=1.0,
                                   probe_timeout_s=PROBE_TIMEOUT_S)
        stamp = time.strftime("%H:%M:%S")
        if ok:
            STATUS.write_text(
                f"UP at {stamp} (after {time.time() - t0:.0f}s watching)\n")
            return 0
        STATUS.write_text(f"down as of {stamp}\n")
        time.sleep(SLEEP_S)


if __name__ == "__main__":
    raise SystemExit(main())
