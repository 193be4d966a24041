"""Wedge-safe deadline runner for on-chip jobs.

Runs a target script with an *in-Python* deadline instead of a shell
``timeout`` — SIGTERM-ing a client between dispatch and fetch is the
exact pathology documented to wedge the tunnel compute path (BENCH.md
"Platform findings"; ADVICE r4 #3).  Same discipline as tpu_probe.py:
the job runs in a daemon thread, the main thread joins with the deadline
plus a half-deadline grace period, so a slow-but-healthy job finishes
instead of being killed mid-fetch; only a genuinely hung job is
abandoned (process exit, never a mid-flight signal from outside).

Usage: python scripts/with_deadline.py <seconds> <script.py> [args...]

Exit code: the job's own (0 on normal return), or 124 on deadline.
"""
import os
import runpy
import sys
import threading
import traceback

DEADLINE = float(sys.argv[1])
SCRIPT = sys.argv[2]
ARGS = sys.argv[3:]

rc = []


def work():
    sys.argv = [SCRIPT] + ARGS
    try:
        runpy.run_path(SCRIPT, run_name="__main__")
        rc.append(0)
    except SystemExit as e:
        code = e.code
        rc.append(code if isinstance(code, int) else (0 if code is None else 1))
    except BaseException:
        traceback.print_exc()
        rc.append(1)


t = threading.Thread(target=work, daemon=True)
t.start()
t.join(DEADLINE)
if not rc:
    print("[with_deadline] %.0fs deadline hit; grace %.0fs for an "
          "in-flight fetch" % (DEADLINE, DEADLINE / 2), flush=True)
    t.join(DEADLINE / 2)
if rc:
    sys.exit(rc[0])
print("[with_deadline] job abandoned after deadline+grace", flush=True)
os._exit(124)
