#!/usr/bin/env python
"""Elastic training supervisor: heartbeat-watched restart-from-checkpoint.

SURVEY §5.3: the reference framework has NO failure detection or elastic
recovery (its only resilience is checkpoint-resume).  This is the thin
TPU-native layer on top of exactly that: launch ``tools/train.py`` with
``--resume-from auto``, watch the HeartbeatHook's liveness file, and restart
the trainer (from the latest orbax checkpoint) when it crashes or stalls.

    python tools/run_elastic.py --max-restarts 3 --stall-timeout 600 -- \
        configs/neural_recon/scannet.py --work-dir results/neucon

Design notes:
  * the child runs in its own process group; a stall kills the exact group
    (never pattern-matched pids);
  * heartbeat via atomic-rename json written by HeartbeatHook
    (runners/hooks_extra.py) — registered automatically when the
    D3M_HEARTBEAT_FILE env var is set;
  * restarts resume from the newest checkpoint (train.py --resume-from auto),
    so progress loss is bounded by the checkpoint interval;
  * exit codes: 0 = training finished; 1 = restart budget exhausted.
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time


def _heartbeat_age(path: str) -> float:
    try:
        with open(path) as f:
            data = json.load(f)
        return time.time() - float(data.get("time", 0.0))
    except (OSError, ValueError):
        return float("inf")


def run_once(train_args, hb_file: str, stall_timeout: float,
             poll: float, log) -> int:
    """One supervised attempt.  Returns the child's exit code; kills the
    child's process group and returns -1 on a heartbeat stall."""
    env = dict(os.environ)
    env["D3M_HEARTBEAT_FILE"] = hb_file
    cmd = [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                        "train.py")] + train_args
    log(f"launch: {' '.join(cmd)}")
    proc = subprocess.Popen(cmd, env=env, start_new_session=True)
    started = time.time()
    try:
        while True:
            rc = proc.poll()
            if rc is not None:
                return rc
            age = _heartbeat_age(hb_file)
            # grace period before the first beat (imports + compiles)
            alive_for = time.time() - started
            if age > stall_timeout and alive_for > stall_timeout:
                log(f"heartbeat stalled ({age:.0f}s > {stall_timeout:.0f}s); "
                    f"killing process group {proc.pid}")
                os.killpg(os.getpgid(proc.pid), signal.SIGTERM)
                try:
                    proc.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
                    proc.wait()
                return -1
            time.sleep(poll)
    except KeyboardInterrupt:
        os.killpg(os.getpgid(proc.pid), signal.SIGTERM)
        proc.wait()
        raise


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--max-restarts", type=int, default=3)
    ap.add_argument("--stall-timeout", type=float, default=600.0,
                    help="seconds without a heartbeat before the trainer "
                         "is declared hung and restarted")
    ap.add_argument("--poll", type=float, default=5.0)
    ap.add_argument("--backoff", type=float, default=10.0,
                    help="seconds to wait before a restart")
    ap.add_argument("--heartbeat-file", default=None)
    ap.add_argument("train_args", nargs=argparse.REMAINDER,
                    help="-- then everything tools/train.py takes "
                         "(config first)")
    args = ap.parse_args(argv)

    train_args = [a for a in args.train_args if a != "--"]
    if not train_args:
        ap.error("pass tools/train.py arguments after --")
    # every attempt resumes from the newest checkpoint
    if "--resume-from" not in train_args:
        train_args += ["--resume-from", "auto"]

    hb_file = args.heartbeat_file or os.path.join(
        tempfile.gettempdir(), f"d3m_heartbeat_{os.getpid()}.json")

    def log(msg):
        print(f"[run_elastic] {msg}", flush=True)

    attempts = 0
    while True:
        rc = run_once(train_args, hb_file, args.stall_timeout, args.poll, log)
        if rc == 0:
            log("training finished")
            return 0
        attempts += 1
        reason = "stall" if rc == -1 else f"exit code {rc}"
        if attempts > args.max_restarts:
            log(f"{reason}; restart budget ({args.max_restarts}) exhausted")
            return 1
        log(f"{reason}; restart {attempts}/{args.max_restarts} "
            f"in {args.backoff:.0f}s (resume from latest checkpoint)")
        time.sleep(args.backoff)


if __name__ == "__main__":
    sys.exit(main())
