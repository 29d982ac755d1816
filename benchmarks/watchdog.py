#!/usr/bin/env python
"""Stall-watchdog runner for long benchmark jobs on a fragile transport.

The dev relay (one framed stdio stream multiplexing all host↔device
traffic) sporadically wedges a client connection mid-request; the client
then waits forever — no error, no timeout. A fresh process always
recovers, and with the persistent compile cache + feature caches a restart
resumes cheaply. This runner supervises a benchmark command, watches its
log for output progress, and kills + restarts it when the log goes quiet
for --stall_sec.

Usage:
  python benchmarks/watchdog.py --log /tmp/run.log --stall_sec 600 \
      --max_restarts 4 -- python benchmarks/eval_scale.py ...
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def log(msg):
    print(f"[watchdog] {msg}", file=sys.stderr, flush=True)


def run_once(cmd, log_path, stall_sec):
    """→ ('done', rc) or ('stalled', None)."""
    with open(log_path, "ab") as lf:
        lf.write(f"\n=== watchdog launch {time.strftime('%H:%M:%S')} ===\n".encode())
        lf.flush()
        proc = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT)
        last_size = -1
        last_progress = time.time()
        while True:
            rc = proc.poll()
            if rc is not None:
                return "done", rc
            size = os.path.getsize(log_path)
            if size != last_size:
                last_size = size
                last_progress = time.time()
            elif time.time() - last_progress > stall_sec:
                log(f"no log output for {stall_sec}s — killing pid {proc.pid}")
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                return "stalled", None
            time.sleep(10)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log", required=True)
    p.add_argument("--stall_sec", type=int, default=600)
    p.add_argument("--max_restarts", type=int, default=4)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- command to supervise")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given (pass it after --)")

    for attempt in range(args.max_restarts + 1):
        if attempt:
            log(f"restart {attempt}/{args.max_restarts}")
        status, rc = run_once(cmd, args.log, args.stall_sec)
        if status == "done":
            log(f"command exited rc={rc}")
            sys.exit(rc)
    log("gave up: stalled on every attempt")
    sys.exit(75)  # EX_TEMPFAIL


if __name__ == "__main__":
    main()
