"""Advisory single-process lock for the TPU tunnel.

Only one process may use the remote TPU at a time (a second client starves
or wedges the tunnel — PROGRESS.md pitfalls). Every bench entry point
(bench.py, bench_suite.py, the campaign driver) takes this flock before
claiming the device, so a driver-run headline bench never times itself
against a half-finished campaign stage: it waits for the lock instead of
silently measuring a contended tunnel (the round-3 7x regression,
VERDICT r3 weak #2).
"""

import errno
import fcntl
import hashlib
import os
import sys
import time

# The lock must live OUTSIDE the repo: a git-tracked lock file gets replaced
# (new inode) by checkouts/merges, silently defeating the flock, and every
# bench run dirties the working tree. /tmp keyed by repo path keeps one lock
# per checkout while surviving branch operations.
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LOCK_PATH = os.path.join(
    "/tmp", f"circuits-tpu-{hashlib.sha1(_REPO.encode()).hexdigest()[:12]}.lock"
)


class TpuLock:
    """flock-based advisory lock; blocks up to ``wait_s`` then proceeds
    anyway (the driver's bench must eventually run even if a stale holder
    died without releasing — flock self-releases on process exit, so the
    timeout only fires for a genuinely busy tunnel)."""

    def __init__(self, wait_s: float | None = None):
        self.wait_s = wait_s if wait_s is not None else float(
            os.environ.get("CIRCUITS_TPU_LOCK_WAIT_S", 1800)
        )
        self.fd: int | None = None
        self.acquired = False

    def __enter__(self):
        if os.environ.get("JAX_PLATFORMS") == "cpu":
            return self  # CPU-forced run: no tunnel involved, no lock
        self.fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o644)
        deadline = time.time() + self.wait_s
        notified = False
        while True:
            try:
                fcntl.flock(self.fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                self.acquired = True
                os.ftruncate(self.fd, 0)
                os.write(self.fd, f"{os.getpid()}\n".encode())
                return self
            except OSError as e:
                if e.errno not in (errno.EACCES, errno.EAGAIN):
                    raise
                if not notified:
                    print(
                        f"tpulock: tunnel busy (holder pid in {LOCK_PATH}), "
                        f"waiting up to {self.wait_s:.0f}s",
                        file=sys.stderr, flush=True,
                    )
                    notified = True
                if time.time() >= deadline:
                    print(
                        "tpulock: wait budget exhausted — proceeding WITHOUT "
                        "the lock (measurements may be contended)",
                        file=sys.stderr, flush=True,
                    )
                    return self
                time.sleep(5.0)

    def __exit__(self, *exc):
        if self.fd is not None:
            if self.acquired:
                fcntl.flock(self.fd, fcntl.LOCK_UN)
            os.close(self.fd)
            self.fd = None
        return False
