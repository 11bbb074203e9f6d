#!/usr/bin/env python3
"""Wait for the axon TPU relay to come back (round-4 utility).

Each attempt is a FRESH subprocess with an internal SIGALRM self-watchdog
(os._exit — it terminates itself, it is never killed externally, so a hung
init never leaves an externally-killed claim behind). Prints a line per
attempt; exits 0 the moment jax.devices() succeeds.

Usage: python3 scripts/r4_tpu_waiter.py [attempt_timeout_s] [sleep_between_s]
"""

import subprocess
import sys
import time

ATTEMPT = """
import os, signal, sys
# DEFAULT SIGALRM disposition (no Python handler): the kernel terminates the
# process even while the init is blocked inside a C call — a Python-level
# handler would never run there (observed: a hung init ignored the handler
# for 15+ min). A hung init usually errors out by itself within ~30 min
# (UNAVAILABLE); the alarm is only the backstop.
signal.alarm(%d)
import jax
try:
    d = jax.devices()
    signal.alarm(0)
    print(d)
    os._exit(0)
except Exception as e:
    sys.stderr.write(f'{type(e).__name__}: {e}\\n')
    os._exit(1)
"""


def main():
    attempt_s = int(sys.argv[1]) if len(sys.argv) > 1 else 1800
    sleep_s = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    n = 0
    while True:
        n += 1
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", ATTEMPT % attempt_s],
                           capture_output=True, text=True)
        stamp = time.strftime("%H:%M:%S")
        if r.returncode == 0:
            print(f"{stamp} attempt {n}: TPU BACK after {time.time()-t0:.0f}s: "
                  f"{r.stdout.strip()}", flush=True)
            return 0
        msg = (r.stderr or r.stdout).strip().splitlines()
        print(f"{stamp} attempt {n}: rc={r.returncode} ({time.time()-t0:.0f}s): "
              f"{msg[-1] if msg else '?'}", flush=True)
        time.sleep(sleep_s)


if __name__ == "__main__":
    sys.exit(main())
