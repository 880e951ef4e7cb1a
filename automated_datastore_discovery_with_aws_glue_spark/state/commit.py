"""Commit backends for the versioned state store — the pluggable seam
behind ``ParquetStateStore._commit_staged``.

A commit publishes a fully-written staging directory as version
``expect + 1`` and flips the ``_LATEST`` pointer, failing with
:class:`~automated_datastore_discovery_with_aws_glue_spark.state.store.ConcurrentWriteError` when another
writer got there first. Two filesystem postures exist in the wild and
each gets a backend:

- :class:`PosixCommitBackend` (default): a strongly-consistent POSIX
  layer (local disk, EFS/NFSv4/Lustre). ``O_CREAT|O_EXCL`` lock file
  serializes the check-rename-flip; ``os.rename`` of the staging dir and
  ``os.replace`` of the pointer are both atomic. This is the behavior
  the store has always had.

- :class:`ConditionalPutCommitBackend`: the rename-less object-store
  shape (S3-style). There is NO atomic directory rename and NO lock
  file; the only atomic primitives are the store's conditional PUTs —
  If-None-Match (create-if-absent) claims the version slot, and
  If-Match (compare-and-swap) flips the pointer. Data files copy into
  the claimed slot non-atomically, which is safe because readers resolve
  versions only through the pointer: a half-copied version directory is
  unreferenced and invisible. This is exactly the Delta-on-S3 /
  Iceberg commit shape (the commit object is the CAS unit).

  Running on a local filesystem (tests, CI), the two conditional-PUT
  primitives are SIMULATED with the closest local equivalents —
  ``os.mkdir`` (atomic create-if-absent) for If-None-Match and an
  ``fcntl.flock``-guarded read-compare-write for the pointer If-Match
  PUT. The simulation stands in for the store's server-side atomicity;
  everything else (multi-file copy, no renames, crash windows) behaves
  exactly as the object store would.

Crash-window contract (both backends): a writer that dies mid-commit
can only ever leave UNREFERENCED garbage — a staging dir (swept by
vacuum after a grace period), an orphaned version dir (POSIX: cleared by
the next same-number commit under the lock; conditional: fail-stop with
``ConcurrentWriteError`` until the stale ``_CLAIM`` is removed — the
same documented operator intervention as a stale lock file). The pointer
itself either still names the old version or fully names the new one —
it never tears, because in both backends the flip is a single atomic
primitive.
"""

from __future__ import annotations

import os
import shutil
import tempfile


def read_pointer(pointer: str) -> int:
    try:
        with open(pointer) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return 0


def _concurrent(msg: str):
    # local import: store imports this module, not the other way round
    from automated_datastore_discovery_with_aws_glue_spark.state.store import ConcurrentWriteError

    return ConcurrentWriteError(msg)


class PosixCommitBackend:
    """Lock-file + atomic-rename commit (the default posture)."""

    def commit(
        self,
        *,
        table: str,
        table_dir: str,
        pointer: str,
        staging: str,
        version_dir: str,
        expect: int,
    ) -> int:
        lock = os.path.join(table_dir, "_COMMIT_LOCK")
        try:
            lock_fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            shutil.rmtree(staging, ignore_errors=True)
            raise _concurrent(f"{table}: commit lock held by another writer") from None
        try:
            found = read_pointer(pointer)
            if found != expect:
                shutil.rmtree(staging, ignore_errors=True)
                raise _concurrent(f"{table}: expected version {expect}, found {found}")
            # a crash between a previous commit's rename and pointer flip
            # leaves an orphan (unreferenced, invisible) version dir at
            # exactly this number; we hold the lock, so nothing live owns
            # it — clear it or the rename wedges every commit (ENOTEMPTY)
            if os.path.exists(version_dir):
                shutil.rmtree(version_dir, ignore_errors=True)
            os.rename(staging, version_dir)
            fd, tmp = tempfile.mkstemp(dir=table_dir, prefix="._latest")
            with os.fdopen(fd, "w") as fh:
                fh.write(str(expect + 1))
            os.replace(tmp, pointer)  # atomic pointer flip
            return expect + 1
        finally:
            os.close(lock_fd)
            os.remove(lock)


#: claim marker inside a version dir being published by the conditional
#: backend; removed after the pointer flip. Leading underscore keeps
#: Spark's readers from treating it as data if it ever survives a crash
#: inside a committed version.
CLAIM_MARKER = "_CLAIM"


class ConditionalPutCommitBackend:
    """Rename-less commit built on conditional PUTs only (see module
    docstring). No lock file, no directory rename:

    1. pointer check (cheap early-out),
    2. If-None-Match create of the version slot (the claim),
    3. non-atomic multi-file copy into the slot (invisible: unreferenced),
    4. If-Match CAS of the pointer — the ONLY step readers observe,
    5. claim marker removed (best-effort; harmless if a crash skips it).

    A competing writer loses at step 2 or step 4 and gets
    ``ConcurrentWriteError`` with its staging cleaned up; the winner's
    data is never touched. A writer that crashes after step 2 leaves a
    claimed-but-unreferenced slot: later commits of that version number
    FAIL-STOP (never silently overwrite — the claimant might still be
    alive mid-copy) until an operator removes the stale claim dir,
    mirroring the POSIX backend's stale-lock-file intervention."""

    def commit(
        self,
        *,
        table: str,
        table_dir: str,
        pointer: str,
        staging: str,
        version_dir: str,
        expect: int,
    ) -> int:
        try:
            found = read_pointer(pointer)
            if found != expect:
                raise _concurrent(f"{table}: expected version {expect}, found {found}")
            try:
                os.mkdir(version_dir)  # If-None-Match: claim the slot
            except FileExistsError:
                raise _concurrent(
                    f"{table}: version slot {os.path.basename(version_dir)} already "
                    "claimed (concurrent writer, or a crashed one — remove the "
                    f"stale {CLAIM_MARKER} dir to recover)"
                ) from None
            with open(os.path.join(version_dir, CLAIM_MARKER), "w") as fh:
                fh.write("publishing")
            self._copy_tree(staging, version_dir)
            if not self._cas_pointer(table_dir, pointer, expect, expect + 1):
                # we own the claim, so the half-published slot is ours to
                # retract; the winner's commit is untouched
                shutil.rmtree(version_dir, ignore_errors=True)
                raise _concurrent(
                    f"{table}: pointer moved past {expect} during publish"
                )
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        shutil.rmtree(staging, ignore_errors=True)
        try:
            os.remove(os.path.join(version_dir, CLAIM_MARKER))
        except OSError:  # pragma: no cover - best-effort; underscore-file is inert
            pass
        return expect + 1

    @staticmethod
    def _copy_tree(src: str, dst: str) -> None:
        """Non-atomic multi-object copy (one PUT per file) — the honest
        object-store publish. Split out so tests can inject a crash
        halfway and prove readers never observe the partial slot."""
        for root, _dirs, files in os.walk(src):
            rel = os.path.relpath(root, src)
            troot = dst if rel == "." else os.path.join(dst, rel)
            os.makedirs(troot, exist_ok=True)
            for name in files:
                shutil.copy2(os.path.join(root, name), os.path.join(troot, name))

    @staticmethod
    def _cas_pointer(table_dir: str, pointer: str, expect: int, new: int) -> bool:
        """If-Match conditional PUT of the pointer object. The object
        store executes this server-side atomically; locally the flock
        critical section simulates that atomicity (the lock guards only
        this read-compare-write, and only among local simulated
        writers — it is NOT part of the commit protocol itself)."""
        import fcntl

        with open(os.path.join(table_dir, "._cas_sim_lock"), "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            if read_pointer(pointer) != expect:
                return False
            fd, tmp = tempfile.mkstemp(dir=table_dir, prefix="._latest")
            with os.fdopen(fd, "w") as fh:
                fh.write(str(new))
            os.replace(tmp, pointer)
            return True
