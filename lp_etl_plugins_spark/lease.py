"""Single-writer fencing for index directories (VERDICT r8 #2).

Every index family's crash contract assumes ONE writer replaying: the
absorbers' redo machinery reconstructs from an arbitrary landed subset
of its OWN writes, but nothing stopped ``maintenance.vacuum``'s
rename-aside compaction from racing a concurrent
``append_saved``/``foreach_batch_*`` on the same directory — an append
landing between :func:`textops._rewrite_parquet_dir`'s temp-write and
its swap is deleted with the ``.__old__`` directory, silently losing
rows (the two-thread test in ``tests/test_lease.py`` demonstrates
exactly that loss without the lease). A real nightly deployment runs
exactly this pair.

The fence is a LEASE FILE beside the index directory
(``<path>.__lease__`` — a sibling, so it survives every substrate's
rename-aside swap and works before the directory exists):

- **acquire** = atomic ``O_CREAT | O_EXCL`` create (the POSIX
  mutual-exclusion primitive on a local filesystem — the same
  driver-local assumption as the rename swap itself; an object-store
  deployment fronts these directories with a transactional table
  format and gets writer fencing from its commit protocol);
- **contention** = loud :class:`LeaseContention` refusal, never
  blocking — the caller decides whether to retry, reschedule, or
  surface it (a nightly vacuum skips the path and reports; a
  streaming absorber lets the micro-batch fail and replay);
- **stale expiry** = a lease older than ``ttl_seconds`` (mtime) is
  from a crashed writer — it is broken by RENAME (exactly one breaker
  wins the rename; losers re-enter the acquire loop), so two
  concurrent breakers cannot both think they removed it and both
  acquire;
- **release** = unlink on exit, crash-tolerated (a leaked lease
  expires by ttl).

Scope: every mutation path acquires it — the per-family
``append_saved`` / ``update`` absorb operations and every
``compact()`` (including ``maintenance.vacuum``'s threshold
compaction). Reads never do: every reader serves committed rows only
(meta-stamp filtering), so a read concurrent with an append or a
rename-aside swap was already safe. Nested acquisition composes
because the scopes are distinct paths (``CurationState.update`` holds
the state ROOT lease while its index half takes ``<root>/index`` —
two files), and a same-path re-entry is a genuine bug the contention
error surfaces.
"""

from __future__ import annotations

import os
import threading
import time
from contextlib import contextmanager


class LeaseContention(RuntimeError):
    """Another writer holds the directory lease — refused loudly
    rather than silently racing the crash contracts."""


# Thread-local default wait budget (see :func:`waiting`): lets a
# caller that WANTS to serialize behind a live writer (the nightly
# vacuum waiting out a streaming absorber's micro-batch) declare that
# once, without threading a wait parameter through every family's
# compact()/append_saved() signature. Thread-local on purpose — an
# absorber driver thread keeps fail-fast semantics while a vacuum
# thread in the same process waits.
_WAIT = threading.local()


@contextmanager
def waiting(seconds: float):
    """Scope a default ``wait_seconds`` for every :func:`dir_lease`
    acquisition on THIS thread: inside the block, lease contention
    polls (50 ms cadence) until the holder releases or ``seconds``
    elapses, then raises :class:`LeaseContention` as before. An
    explicit ``dir_lease(..., wait_seconds=...)`` still wins. Nests by
    shadowing (inner scope's budget applies; outer restored on exit)."""
    prev = getattr(_WAIT, "seconds", None)
    _WAIT.seconds = float(seconds)
    try:
        yield
    finally:
        if prev is None:
            del _WAIT.seconds
        else:
            _WAIT.seconds = prev


# Serializes the acquire/stale-break section WITHIN a process: the
# realistic contention (absorber driver threads vs a vacuum thread in
# the one Spark driver) is same-process, and without this lock the
# stale-break path has a TOCTOU hole — a breaker's rename acts on
# whatever file is at the path AT RENAME TIME, which can be a FRESH
# lease created between the staleness stat and the rename (the
# 16-thread storm test caught exactly that: two holders at once).
# Held only across the acquire attempt, never across the caller's
# operation. Cross-process, the same window is closed by the
# identity check below.
_ACQUIRE_LOCK = threading.Lock()


def _lease_file(path: str) -> str:
    from .textops import _local_path

    return _local_path(path).rstrip("/") + ".__lease__"


@contextmanager
def dir_lease(
    path: str,
    *,
    role: str,
    ttl_seconds: float = 3600.0,
    wait_seconds: float | None = None,
):
    """Hold the single-writer lease for ``path`` for the duration of
    the ``with`` block. Raises :class:`LeaseContention` when a live
    (non-expired) lease exists. ``role`` is recorded in the lease file
    for the contention message ("append_saved", "compact", ...);
    ``ttl_seconds`` bounds how long a crashed writer's leaked lease
    fences the directory — size it above the operation's worst-case
    runtime (the default 1 h covers any single compaction/absorb this
    engine runs; a multi-hour job passes its own).

    ``wait_seconds`` (or an enclosing :func:`waiting` scope) turns the
    refusal into a BOUNDED wait: contention is retried on a 50 ms poll
    until the holder releases or the budget elapses, then raised. The
    default stays fail-fast — an absorber's micro-batch should fail
    and replay, not queue; it is the scheduled maintenance caller that
    knows it can afford to wait."""
    lease = _lease_file(path)
    parent = os.path.dirname(lease)
    if parent:
        os.makedirs(parent, exist_ok=True)
    budget = (
        float(wait_seconds)
        if wait_seconds is not None
        else float(getattr(_WAIT, "seconds", 0.0))
    )
    deadline = time.monotonic() + budget
    while True:
        try:
            _acquire_once(lease, path, role, ttl_seconds)
            break
        except LeaseContention:
            now = time.monotonic()
            if now >= deadline:
                raise
            time.sleep(min(0.05, deadline - now))
    try:
        yield
    finally:
        try:
            os.unlink(lease)
        except FileNotFoundError:
            pass


def _acquire_once(
    lease: str, path: str, role: str, ttl_seconds: float
) -> None:
    """One acquire attempt (create, or break a stale lease and
    create): returns holding the lease, raises
    :class:`LeaseContention` otherwise. Serialized process-wide by
    ``_ACQUIRE_LOCK`` (never held across the caller's operation)."""
    acquired = False
    with _ACQUIRE_LOCK:
        for _ in range(3):
            try:
                fd = os.open(lease, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                try:
                    os.write(
                        fd,
                        f"{role} pid={os.getpid()} t={time.time()}\n".encode(),
                    )
                finally:
                    os.close(fd)
                acquired = True
                break
            except FileExistsError:
                try:
                    st = os.stat(lease)
                except FileNotFoundError:
                    continue  # holder released between create and stat
                if time.time() - st.st_mtime <= ttl_seconds:
                    holder = ""
                    try:
                        with open(lease) as f:
                            holder = f.read().strip()
                    except OSError:
                        pass
                    raise LeaseContention(
                        f"{role}: another writer holds the lease on {path}"
                        f"{' (' + holder + ')' if holder else ''} — "
                        "concurrent mutation would race the crash "
                        "contracts; retry after it releases, or remove "
                        "the stale lease file if the holder is known "
                        f"dead ({lease})"
                    )
                # stale (crashed writer): break by rename to a unique
                # name, then VERIFY identity — the rename moves
                # whatever file is at the path at rename time, which a
                # cross-process race could have replaced with a FRESH
                # lease between the stat and the rename. On identity
                # mismatch the stolen fresh lease is restored with a
                # no-clobber link and the attempt is contention.
                uniq = (
                    f"{lease}.broken.{os.getpid()}.{threading.get_ident()}"
                )
                try:
                    os.rename(lease, uniq)
                except FileNotFoundError:
                    continue  # another breaker won — retry the create
                moved = os.stat(uniq)
                if (moved.st_ino, moved.st_mtime) != (st.st_ino, st.st_mtime):
                    try:
                        os.link(uniq, lease)  # fails rather than clobbers
                    except FileExistsError:
                        pass
                    os.unlink(uniq)
                    raise LeaseContention(
                        f"{role}: lost the stale-break race on {path} to a "
                        "writer that re-acquired first — retry later"
                    )
                os.unlink(uniq)
    if not acquired:
        raise LeaseContention(
            f"{role}: could not acquire the lease on {path} after "
            "stale-break retries — a writer keeps re-acquiring it"
        )
