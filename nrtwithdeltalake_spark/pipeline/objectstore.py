"""Object-store implementation of the commit-store seam.

The versioned format's entire optimistic-concurrency story rests on one
primitive (``pipeline/tables.py::LocalLinkCommitStore``):
``put_if_absent(target, payload) -> bool`` — of all racers for one
target, exactly one wins; losers observe the winner's complete bytes.
The default implementation is POSIX-hardlink based and only correct on
filesystems with atomic link (local disk, HDFS via create-no-overwrite).

The reference pipeline's actual deployment target is an object store
(ABFS mounts — ``/root/reference/COPY_MSQL_TO_SILVER.py:51-76``), where
a bare PUT is last-writer-wins and a HEAD-then-PUT race loses commits
silently. Every major object store now exposes a **conditional put**
that makes the primitive implementable natively:

* S3:  ``PUT`` with ``If-None-Match: *`` → ``412 Precondition Failed``
  if the key exists (GA since 2024, public API).
* GCS: ``x-goog-if-generation-match: 0`` → ``412``.
* ADLS/ABFS: ``If-None-Match: *`` ETag precondition → ``409/412``.

``ConditionalPutCommitStore`` maps the seam onto that one call, plus the
retry hazard unique to remote stores: a request can SUCCEED while its
response is lost (timeout), so a blind retry sees ``412`` *because our
own first attempt won*. Commit payloads embed writer identity (app id +
txn token + timestamp), so a read-back byte-compare resolves ownership
exactly; the store does that automatically on a post-ambiguity 412.

``InMemoryObjectStore`` is the local integration fake: it honors the
precondition atomically (or deliberately violates it, to prove the
conformance storm catches a broken backend), injects ambiguous
failures, and can write-through to the local filesystem so a real
``VersionedTable`` can run end-to-end against the seam in tests.
"""

from __future__ import annotations

import os
import tempfile
import threading


class PreconditionFailed(Exception):
    """The conditional put lost: the key already exists (HTTP 412)."""


class AmbiguousPutError(Exception):
    """The put's outcome is unknown (timeout / dropped response): it may
    or may not have been applied. The caller must re-probe, not assume."""


class InMemoryObjectStore:
    """Thread-safe fake of the minimal object-store surface the commit
    store needs: conditional put + get.

    Knobs (for conformance/negative tests):

    * ``honor_precondition=False`` — behave like a bare PUT
      (last-writer-wins), the broken backend the storm must flag;
    * ``ambiguous_failures=N`` — the first N puts APPLY and then raise
      ``AmbiguousPutError`` (a success whose response was lost);
    * ``write_through=True`` — mirror objects to the local filesystem at
      the key path (temp+rename, so readers never see a torn file),
      letting ``VersionedTable`` readers consume commits published
      through this store.
    """

    def __init__(
        self,
        honor_precondition: bool = True,
        ambiguous_failures: int = 0,
        write_through: bool = False,
    ) -> None:
        self._objects: dict[str, str] = {}
        self._lock = threading.Lock()
        self._honor = honor_precondition
        self._ambiguous_left = ambiguous_failures
        self._write_through = write_through

    def put_object(self, key: str, body: str, *, if_none_match: bool) -> None:
        """Store ``body`` at ``key``. With ``if_none_match`` (the only
        mode the commit store uses) raise :class:`PreconditionFailed`
        if the key exists — atomically, like S3's ``If-None-Match: *``."""
        with self._lock:
            if if_none_match and self._honor and key in self._objects:
                raise PreconditionFailed(key)
            self._objects[key] = body
            ambiguous = self._ambiguous_left > 0
            if ambiguous:
                self._ambiguous_left -= 1
        if self._write_through:
            self._mirror_to_fs(key, body)
        if ambiguous:
            raise AmbiguousPutError(key)

    def get_object(self, key: str) -> str | None:
        with self._lock:
            return self._objects.get(key)

    def _mirror_to_fs(self, key: str, body: str) -> None:
        d = os.path.dirname(key)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".osmirror")
        with os.fdopen(fd, "w") as f:
            f.write(body)
        os.replace(tmp, key)  # atomic for readers; exclusivity already won


class LocalFSConditionalPutStore:
    """A second REAL implementation of the object-store client surface
    (``put_object(key, body, if_none_match=...)`` / ``get_object``) —
    over an actual filesystem instead of a dict. It exists to prove the
    SEAM, not to add a backend: binding boto3 (S3 ``If-None-Match: *``),
    google-cloud-storage (``if_generation_match=0``) or
    azure-storage-blob (ETag ``If-None-Match``) means implementing
    exactly these two methods with the client library's conditional
    write; this container has no cloud credentials, so the conformance
    storm runs against this FS-backed client to prove
    ``ConditionalPutCommitStore`` works over a real medium with real
    concurrency, not just the in-memory fake.

    Atomicity: the body lands in a same-directory tempfile first
    (``mkstemp`` opens with ``O_CREAT|O_EXCL``, so the temp is private),
    then ``os.link`` publishes it at ``key`` — link is atomic and fails
    ``EEXIST`` for every racer but one, which maps to
    :class:`PreconditionFailed` exactly like a 412. Readers therefore
    never observe a torn object (they see nothing, or the complete
    winner bytes), matching per-key read atomicity object stores give
    for free."""

    def put_object(self, key: str, body: str, *, if_none_match: bool) -> None:
        d = os.path.dirname(key)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".osput")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(body)
            if not if_none_match:
                os.replace(tmp, key)  # unconditional PUT: last writer wins
                return
            try:
                os.link(tmp, key)
            except FileExistsError:
                raise PreconditionFailed(key) from None
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def get_object(self, key: str) -> str | None:
        try:
            with open(key) as f:
                return f.read()
        except FileNotFoundError:
            return None


class AmbiguityInjector:
    """Wrap any object-store client so its first ``n`` puts APPLY and
    then raise :class:`AmbiguousPutError` — the lost-response hazard,
    injectable against REAL backends (the in-memory fake has the knob
    built in; this brings the same storm to ``LocalFSConditionalPut
    Store`` and to any future cloud binding)."""

    def __init__(self, client, n: int = 1) -> None:
        self._client = client
        self._left = n
        self._lock = threading.Lock()

    def put_object(self, key: str, body: str, *, if_none_match: bool) -> None:
        self._client.put_object(key, body, if_none_match=if_none_match)
        with self._lock:
            if self._left > 0:
                self._left -= 1
                raise AmbiguousPutError(key)

    def get_object(self, key: str) -> str | None:
        return self._client.get_object(key)


class ConditionalPutCommitStore:
    """The commit-store seam over any conditional-put object store.

    Satisfies the exact contract of ``LocalLinkCommitStore`` (see
    ``pipeline/tables.py:274`` — exactly one winner per target, losers
    see the winner's complete bytes, readers never observe a partial
    payload; object stores give read-atomicity per key for free).

    Retry semantics: a transient/ambiguous error is retried up to
    ``max_retries`` times. If a retry hits ``PreconditionFailed``, the
    stored object is read back and byte-compared with our payload —
    equal bytes mean OUR earlier attempt won (commit payloads carry
    writer identity, so byte equality is ownership); different bytes
    mean a genuine loss. A clean first-attempt 412 is a plain loss with
    no read-back needed.
    """

    def __init__(self, client, max_retries: int = 3) -> None:
        self._client = client
        self._max_retries = max_retries

    def put_if_absent(self, target: str, payload: str) -> bool:
        saw_ambiguity = False
        for _ in range(self._max_retries + 1):
            try:
                self._client.put_object(target, payload, if_none_match=True)
                return True
            except PreconditionFailed:
                if saw_ambiguity:
                    # our own lost-response attempt may have been applied
                    return self._client.get_object(target) == payload
                return False
            except AmbiguousPutError:
                saw_ambiguity = True
                continue
        # retries exhausted with the outcome still unknown: the one safe
        # answer is to re-probe once and otherwise surface the ambiguity
        stored = self._client.get_object(target)
        if stored is not None:
            return stored == payload
        raise AmbiguousPutError(
            f"commit put outcome unknown after {self._max_retries} retries: "
            f"{target}"
        )
